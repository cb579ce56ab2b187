"""A/B the Pallas splat kernel vs the XLA chunked matmul splat on the chip.

Shapes are the b=10 256px train step's real warp-backward splats (from the
round-4 device profile): 2x (256,256,64)/65536q, 3x (128,128,128)/16384q,
3x (64,64,256)/4096q. Honest value-fetch timing; exactness vs the XLA
splat (f32 exact; bf16 to MXU product rounding).

Usage: python tools/probe_splat_pallas.py [dtype=bf16|f32]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops.pallas_splat import splat_pallas
    from mrfa_tpu.ops.sampler import _splat

    dt = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") else jnp.bfloat16
    rng = np.random.RandomState(0)
    b = 10

    for (h, w, c) in [(256, 256, 64), (128, 128, 128), (64, 64, 256)]:
        n = h * w
        g = jnp.asarray(rng.randn(b, n, c), dt)
        y0 = jnp.asarray(rng.randint(-1, h + 1, (b, n)), jnp.int32)
        x0 = jnp.asarray(rng.randint(-1, w + 1, (b, n)), jnp.int32)
        wy0, wy1, wx0, wx1 = (
            jnp.asarray(rng.rand(b, n), jnp.float32) for _ in range(4)
        )

        def run(name, fn):
            f = jax.jit(lambda *a: fn(*a, h, w))
            out = f(g, y0, wy0, wy1, x0, wx0, wx1)
            # scalar value fetch (the full (B,H,W,C) f32 pull through the
            # tunnel costs ~500 ms and would swamp the measurement)
            _ = float(np.asarray(out[0, 0, 0, 0]))  # compile + sync
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(g, y0, wy0, wy1, x0, wx0, wx1)
            _ = float(np.asarray(out[0, 0, 0, 0]))  # bounds completion
            dtms = (time.perf_counter() - t0) / reps * 1e3
            print(f"  {name:18s} {dtms:8.3f} ms", flush=True)
            return out

        print(f"(B={b}, {h}x{w}x{c}, N={n}, {np.dtype(dt).name})")
        want = run("xla chunked", _splat)
        got = run("pallas", splat_pallas)
        err = float(jnp.max(jnp.abs(want - got)))
        scale = float(jnp.max(jnp.abs(want)))
        print(f"  max_abs_err {err:.3e} (rel {err/scale:.3e})")


if __name__ == "__main__":
    main()
