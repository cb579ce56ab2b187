"""On-chip reconstruction eval run (VERDICT r3 item 5).

Runs `evals.reconstruction` — the full metrics harness of
/root/reference/reconstruction.py:22-82 — on the real TPU over a small
synthetic 256px video set (smooth rigid-motion clips, not noise, so the
metrics are meaningful numbers rather than saturated constants), with
random-init flagship weights, and reports
{l1, lpips (with provenance), psnr, frames, eval_fps, wall_s}.

The numbers are NOT comparable to the reference's released-checkpoint
table (no pretrained weights in-env; PARITY.md "Pretrained weights") —
this artifact proves the device eval path end-to-end and records its
throughput.

Usage: python tools/run_eval_device.py [num_videos] [frames_per_video]
MRFA_BENCH_DTYPE=f32 for full precision (default bf16 compute policy).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256


def make_clip(rng: np.random.RandomState, t: int) -> np.ndarray:
    """A smooth clip: gaussian blobs + a gradient background drifting along
    per-clip random directions. Every frame is a diffeomorphic shift of the
    first, which is exactly the structure reconstruction assumes."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    n_blob = 4
    cx = rng.rand(n_blob)
    cy = rng.rand(n_blob)
    vx = (rng.rand(n_blob) - 0.5) * 0.02
    vy = (rng.rand(n_blob) - 0.5) * 0.02
    col = rng.rand(n_blob, 3)
    frames = []
    for k in range(t):
        img = np.stack([xx * 0.4, yy * 0.4, (xx + yy) * 0.2], axis=-1)
        for b in range(n_blob):
            d2 = (xx - (cx[b] + k * vx[b])) ** 2 + (yy - (cy[b] + k * vy[b])) ** 2
            img += np.exp(-d2 / 0.01)[..., None] * col[b]
        frames.append(np.clip(img, 0.0, 1.0))
    return (np.stack(frames) * 255).astype(np.uint8)


def main():
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    dtype_flag = os.environ.get("MRFA_BENCH_DTYPE", "bf16")
    if dtype_flag == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.data.dataset import FramesDataset
    from mrfa_tpu.evals import reconstruction
    from mrfa_tpu.models.mrfa import MRFA

    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    rng = np.random.RandomState(0)
    root = tempfile.mkdtemp(prefix="eval_vids_")
    for v in range(n_videos):
        vdir = os.path.join(root, "test", f"v{v}")
        os.makedirs(vdir)
        clip = make_clip(rng, n_frames)
        for t in range(n_frames):
            imageio.imsave(os.path.join(vdir, f"{t:07d}.png"), clip[t])

    cfg = _flagship_cfg(SIZE)
    cfg["reconstruction_params"] = {"frame_batch": 8, "format": ".mp4"}
    cfg["visualizer_params"] = {"draw_border": True, "colormap": "gist_rainbow"}
    model = MRFA(cfg)

    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }

    ds = FramesDataset(root, frame_shape=(SIZE, SIZE, 3), is_train=False)
    log_dir = tempfile.mkdtemp(prefix="eval_out_")

    # metric runs default to metrics-only; EVAL_VIS=1 adds the per-frame
    # visualization grids + mp4 encode (host-encode wall, not device wall)
    t0 = time.perf_counter()
    results = reconstruction(
        cfg, model, variables, log_dir, ds,
        save_visualizations=bool(os.environ.get("EVAL_VIS")),
    )
    wall = time.perf_counter() - t0
    results["dtype"] = dtype_flag
    results["wall_s"] = round(wall, 2)
    results["eval_fps"] = round(results["frames"] / wall, 2)
    results["artifacts"] = sorted(os.listdir(os.path.join(log_dir, "reconstruction")))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
