"""Checkpoint conversion CLI: reference .pth -> orbax (and weight inspection).

  python -m mrfa_tpu.cli.convert --config config/vox1.yaml \
      --checkpoint vox.pth --out converted_ckpt [--report]

The converted tree is {params, batch_stats} ready for cli/run.py --checkpoint.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True, help="reference .pth")
    parser.add_argument("--out", required=True, help="orbax output directory")
    parser.add_argument(
        "--report", action="store_true",
        help="print all unmatched/unused leaves",
    )
    parser.add_argument(
        "--drop_decoder_pos_embedding", action="store_true",
        help="reference train-resume rule (train.py:30 there)",
    )
    args = parser.parse_args(argv)

    from mrfa_tpu.config import load_config, model_config
    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.train.loop import init_model_variables
    from mrfa_tpu.utils.checkpoint import load_torch_weights_into, save_checkpoint

    config = load_config(args.config)
    model = MRFA(model_config(config))
    variables = init_model_variables(model, model.cfg)
    merged, missing, unexpected = load_torch_weights_into(
        variables,
        args.checkpoint,
        drop_decoder_pos_embedding=args.drop_decoder_pos_embedding,
        verbose=True,
    )
    if args.report:
        for m in missing:
            print(f"MISSING (kept init): {m}")
        for u in unexpected:
            print(f"UNUSED .pth leaf:    {u}")
    save_checkpoint(
        args.out,
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        step=0,
    )
    print(f"converted -> {args.out}/0 "
          f"({len(missing)} missing, {len(unexpected)} unused leaves)")


if __name__ == "__main__":
    main()
