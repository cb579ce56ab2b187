"""Single-animation demo CLI.

Usage parity with /root/reference/demo.py:101-161:

  python -m mrfa_tpu.cli.demo --config config/vox1.yaml \
      --checkpoint vox.pth --source_image src.png --driving_video drv.mp4 \
      --result_video result.mp4 [--relative] [--adapt_scale] \
      [--img_shape 256,256]
"""
from __future__ import annotations

import argparse

import numpy as np


def resize_frame(frame: np.ndarray, shape) -> np.ndarray:
    h, w = shape
    if frame.shape[0] == h and frame.shape[1] == w:
        return frame.astype(np.float32)
    try:
        import cv2

        return cv2.resize(frame, (w, h), interpolation=cv2.INTER_AREA).astype(np.float32)
    except ImportError:  # pragma: no cover
        from PIL import Image

        im = Image.fromarray((frame * 255).astype(np.uint8)).resize((w, h))
        return np.asarray(im).astype(np.float32) / 255.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--source_image", required=True)
    parser.add_argument("--driving_video", required=True)
    parser.add_argument("--result_video", default="result.mp4")
    parser.add_argument("--relative", dest="relative", action="store_true")
    parser.add_argument("--adapt_scale", dest="adapt_scale", action="store_true")
    parser.add_argument("--img_shape", default="256,256", type=lambda s: [int(x) for x in s.split(",")])
    parser.add_argument(
        "--find_best_frame", action="store_true",
        help="anchor relative animation at the driving frame whose pose "
             "best matches the source (model-keypoint distance)",
    )
    parser.add_argument("--fps", type=int, default=25)
    parser.set_defaults(relative=True)
    args = parser.parse_args(argv)

    try:
        import imageio.v2 as imageio
    except ImportError:  # pragma: no cover
        import imageio

    from mrfa_tpu.animate import Animator
    from mrfa_tpu.config import load_config, model_config
    from mrfa_tpu.data.dataset import img_as_float32, read_video
    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.train.loop import init_model_variables
    from mrfa_tpu.utils.checkpoint import load_torch_weights_into, restore_checkpoint

    config = load_config(args.config)
    model = MRFA(model_config(config))
    variables = init_model_variables(model, model.cfg)
    if args.checkpoint is not None:
        if args.checkpoint.endswith(".pth"):
            variables, _, _ = load_torch_weights_into(variables, args.checkpoint)
        else:
            target = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
            restored, _ = restore_checkpoint(args.checkpoint, target)
            variables = restored
    else:
        print("warning: running demo with random weights (no --checkpoint)")

    source_image = img_as_float32(imageio.imread(args.source_image))
    if source_image.shape[-1] == 4:
        source_image = source_image[..., :3]
    driving_video = read_video(args.driving_video)

    shape = args.img_shape
    source_image = resize_frame(source_image, shape)
    driving_video = np.stack([resize_frame(f, shape) for f in driving_video])

    animator = Animator(model, variables, relative=args.relative)
    if args.find_best_frame:
        predictions = animator.make_animation_from_best_frame(
            source_image, driving_video, adapt_movement_scale=args.adapt_scale
        )
    else:
        predictions = animator.make_animation(
            source_image, driving_video, adapt_movement_scale=args.adapt_scale
        )
    from mrfa_tpu.utils.video import save_video

    written = save_video(
        args.result_video,
        [(255 * np.clip(p, 0, 1)).astype(np.uint8) for p in predictions],
        fps=args.fps,
    )
    print(f"saved {len(predictions)} frames to {written}")


if __name__ == "__main__":
    main()
