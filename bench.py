"""Benchmark: 256px single-stream animation frames/sec on one TPU chip.

Measures the full per-frame serving step of the flagship (MTIA prior) model —
driving keypoint encoding + relative normalization + dense motion + 6-step
RaftFlow refinement + generator decode — as one fused jitted function,
matching the reference's demo loop work (/root/reference/demo.py:55-72; the
reference additionally re-syncs per frame, we measure steady-state device
throughput with host round trip per frame).

Baseline note: the reference publishes no frames/sec (BASELINE.md). The
north-star target is >= 2x an A100's single-stream fps; an A100 running the
PyTorch reference at 256px is estimated at ~45 fps (eager, unfused gathers),
so vs_baseline is reported against 90 fps. This stands in until a measured
A100 number exists.

Prints exactly one JSON line:
  {"metric": "animation_fps_256px", "value": N, "unit": "frames/sec",
   "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 90.0  # 2 x estimated A100 single-stream fps (see docstring)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from mrfa_tpu.animate import Animator
    from mrfa_tpu.models.mrfa import MRFA

    size = 256
    cfg = _flagship_cfg(size)
    model = MRFA(cfg)
    rng = np.random.RandomState(0)

    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    import functools

    # jit the init: eager init is thousands of tiny ops (minutes over the
    # dev-env device tunnel); one compiled graph takes seconds
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

    animator = Animator(model, variables, relative=True)
    source = rng.rand(1, size, size, 3).astype(np.float32)
    frames = [rng.rand(1, size, size, 3).astype(np.float32) for _ in range(4)]

    # per-clip setup (hoisted out of the frame loop, as in serving)
    src = jnp.asarray(source)
    img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
    kp_source = animator._encode(animator.variables, src)
    kp_d0 = animator._encode(animator.variables, jnp.asarray(frames[0]))
    scale = jnp.float32(1.0)

    def step(frame_np):
        return animator._frame(
            animator.variables, src, img_down, kp_source, kp_d0,
            jnp.asarray(frame_np), scale,
        )

    out, _, _ = step(frames[0])  # warmup / compile
    jax.block_until_ready(out)

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, _, _ = step(frames[i % len(frames)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "animation_fps_256px",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
