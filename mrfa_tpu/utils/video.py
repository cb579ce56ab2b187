"""Video/image IO helpers with graceful backend fallback.

Writing order: imageio (ffmpeg/pyav if present) -> OpenCV VideoWriter ->
a directory of PNG frames (always available). GIF always via imageio.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

try:
    import imageio.v2 as imageio
except ImportError:  # pragma: no cover
    import imageio


def save_image(path: str, image: np.ndarray) -> None:
    imageio.imsave(path, image)


def save_video(path: str, frames: List[np.ndarray], fps: int = 25) -> str:
    """Save uint8 RGB frames; returns the path actually written."""
    frames = [np.asarray(f) for f in frames]
    if path.endswith(".gif"):
        imageio.mimsave(path, frames, fps=fps)
        return path
    try:
        imageio.mimsave(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        import cv2

        h, w = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
        ok = writer.isOpened()
        if ok:
            for f in frames:
                writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        if ok and os.path.getsize(path) > 0:
            return path
    except Exception:
        pass
    # last resort: PNG frame directory
    out_dir = os.path.splitext(path)[0] + "_frames"
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(frames):
        imageio.imsave(os.path.join(out_dir, f"{i:06d}.png"), f)
    return out_dir
