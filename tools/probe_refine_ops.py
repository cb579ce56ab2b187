"""Device-time of the refinement loop's constituent ops at real frame shapes.

Scan-chain methodology. Shapes are the 256px serving frame's: feature warps
at each scale (x3 call sites per scale), corr upsampling at i>3, corr_hw
driving-axis pooling at i<3, and the refine-stage convs are covered by the
decoder aggregate (probe_frame.py).
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops.sampler import grid_sample, sample_pixel
    from mrfa_tpu.ops.resize import avg_pool, resize_bilinear

    rng = np.random.RandomState(0)

    def wall(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        return (time.perf_counter() - t0) / reps

    def report(name, op, x, aux):
        def make(k):
            @jax.jit
            def run(x, aux):
                def body(c, _):
                    out = op(c, aux)
                    c = c + 1e-30 * jnp.mean(out).astype(c.dtype)
                    return c, ()
                c, _ = jax.lax.scan(body, x, None, length=k)
                return jnp.sum(c)
            return run
        t1 = wall(make(1), x, aux)
        tk = wall(make(21), x, aux)
        print(f"{name:34s}: {(tk - t1) / 20 * 1e3:8.3f} ms/op", flush=True)

    dt = jnp.bfloat16
    for res, ch in ((256, 64), (128, 128), (64, 256), (32, 512)):
        feat = jnp.asarray(rng.randn(1, res, res, ch), dt)
        coords = jnp.asarray(
            rng.rand(1, res, res, 2) * res, jnp.float32
        )
        report(
            f"sample_pixel {res}x{res}x{ch}",
            lambda c, a: sample_pixel(c, a), feat, coords,
        )
        grid = jnp.asarray(rng.rand(1, res, res, 2) * 2 - 1, jnp.float32)
        report(
            f"grid_sample  {res}x{res}x{ch}",
            lambda c, a: grid_sample(c, a, align_corners=False), feat, grid,
        )

    corr = jnp.asarray(rng.randn(1, 64, 64, 98), dt)
    report(
        "resize corr 64->256 (98ch)",
        lambda c, a: resize_bilinear(c, 256, align_corners=True), corr, corr,
    )
    report(
        "resize corr 64->128 (98ch)",
        lambda c, a: resize_bilinear(c, 128, align_corners=True), corr, corr,
    )

    corr_hw = jnp.asarray(rng.randn(1, 64, 64, 4096), dt)
    for f in (8, 4, 2):
        report(
            f"avg_pool corr_hw f={f}",
            lambda c, a, f=f: avg_pool(c, f), corr_hw, corr_hw,
        )

    flow = jnp.asarray(rng.randn(1, 128, 128, 2), jnp.float32)
    report(
        "resize flow 128->256",
        lambda c, a: resize_bilinear(c, 256, align_corners=True), flow, flow,
    )


if __name__ == "__main__":
    main()
