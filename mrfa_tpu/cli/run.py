"""Main CLI: train / reconstruction / animate.

Usage parity with /root/reference/run.py:28-88 (no torch.distributed.launch:
multi-chip comes from the JAX mesh; multi-host via jax.distributed):

  python -m mrfa_tpu.cli.run --config config/vox1.yaml --mode train \
      --log_dir log [--checkpoint path.pth|orbax-dir]
"""
from __future__ import annotations

import argparse
import os
import shutil
from datetime import datetime

import jax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config yaml")
    parser.add_argument(
        "--mode", default="train",
        choices=["train", "reconstruction", "animate"],
    )
    parser.add_argument("--log_dir", default="log", help="path to log into")
    parser.add_argument(
        "--checkpoint", default=None,
        help="reference .pth or orbax checkpoint dir to restore",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() for multi-host",
    )
    parser.add_argument(
        "--max_steps_per_epoch", type=int, default=None,
        help="debug: cap steps per epoch",
    )
    args = parser.parse_args(argv)

    if args.distributed:
        jax.distributed.initialize()

    from mrfa_tpu.config import load_config, model_config
    from mrfa_tpu.data.dataset import FramesDataset
    from mrfa_tpu.models.mrfa import MRFA

    config = load_config(args.config)

    # log-dir convention mirrors the reference: <log_dir>_<configname>, or the
    # checkpoint's directory for eval modes
    if args.checkpoint is not None and args.mode != "train":
        log_dir = os.path.join(*os.path.split(args.checkpoint)[:-1]) or "."
    else:
        log_dir = os.path.join(
            args.log_dir,
            os.path.basename(args.config).split(".")[0],
        )
        if args.mode == "train":
            log_dir += " " + datetime.now().strftime("%d_%m_%y_%H.%M.%S")

    model = MRFA(model_config(config))
    dataset = FramesDataset(
        is_train=(args.mode.startswith("train")),
        **config["dataset_params"],
    )

    if jax.process_index() == 0:
        os.makedirs(log_dir, exist_ok=True)
        if not os.path.exists(os.path.join(log_dir, os.path.basename(args.config))):
            shutil.copy(args.config, log_dir)

    if args.mode == "train":
        from mrfa_tpu.train.loop import train

        print(f"Training... (devices: {jax.device_count()})")
        train(
            config, model, args.checkpoint, log_dir, dataset,
            seed=args.seed, max_steps_per_epoch=args.max_steps_per_epoch,
        )
    else:
        from mrfa_tpu.train.loop import init_model_variables
        from mrfa_tpu.utils.checkpoint import (
            load_torch_weights_into,
            restore_checkpoint,
        )

        variables = init_model_variables(model, model.cfg, args.seed)
        if args.checkpoint is not None:
            if args.checkpoint.endswith(".pth"):
                variables, _, _ = load_torch_weights_into(variables, args.checkpoint)
            else:
                ckpt_target = {
                    "params": variables["params"],
                    "batch_stats": variables["batch_stats"],
                }
                restored, _ = restore_checkpoint(args.checkpoint, ckpt_target)
                variables = {
                    "params": restored["params"],
                    "batch_stats": restored["batch_stats"],
                }
        else:
            print("warning: evaluating with random weights (no --checkpoint)")

        if args.mode == "reconstruction":
            from mrfa_tpu.evals import reconstruction

            print("Reconstruction...")
            reconstruction(config, model, variables, log_dir, dataset)
        elif args.mode == "animate":
            from mrfa_tpu.evals import animate

            print("Animate...")
            animate(config, model, variables, log_dir, dataset)


if __name__ == "__main__":
    main()
