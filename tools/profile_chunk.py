"""Device profile of the chunked animation step: where does the ~120 ms fixed
per-dispatch penalty (vs K * per-frame time) go?

Usage: python tools/profile_chunk.py [K]   (default 4)
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_frame import parse_xplane  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()
    from mrfa_tpu.animate import Animator
    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    animator = Animator(model, variables, relative=True)
    src = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    frame0 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
    kp_source = animator._encode(animator.variables, src)
    kp_d0 = animator._encode(animator.variables, frame0)
    scale = jnp.float32(1.0)
    cache = animator._encode_source(animator.variables, src, kp_source, img_down)
    chunk = jnp.asarray(rng.rand(K, 1, size, size, 3).astype(np.float32))

    def step():
        return animator._frame_chunk(
            animator.variables, src, img_down, kp_source, kp_d0, chunk, scale,
            cache,
        )

    outs = step()
    _ = np.asarray(outs)  # warmup + compile

    # honest wall timing first
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        outs = step()
    _ = float(np.asarray(outs[-1]).mean())
    wall = (time.perf_counter() - t0) / n
    print(f"chunk K={K}: {wall*1e3:.1f} ms/dispatch = {wall/K*1e3:.2f} ms/frame")

    logdir = f"/tmp/mrfa_prof_chunk{K}"
    N = 6
    jax.profiler.start_trace(logdir)
    for _ in range(N):
        outs = step()
    _ = np.asarray(outs)
    jax.profiler.stop_trace()
    per_op, per_cat, total = parse_xplane(logdir)
    print(f"dispatches traced: {N}  ({total / N * 1e3:.2f} ms device-op/dispatch)")
    print(f"total device-op time: {total*1e3:.2f} ms")
    print("\n== by category ==")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:38s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")
    print("\n== top ops ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {k[:70]:70s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")


if __name__ == "__main__":
    main()
