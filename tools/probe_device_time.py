"""DEVICE-time measurement of lookup kernels via in-jit scan chains.

Per-call wall timing through the axon tunnel has a ~2 ms host dispatch floor
(a null kernel, avg_pool, and the full lookup all measure ~2-3 ms), so
per-op numbers are issue-bound, not device-bound. Here K dependent
iterations run inside ONE jitted scan (outputs folded into the next
iteration's coords to defeat CSE/overlap); device time per op =
(T(K) - T(1)) / (K - 1).
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops import pallas_kernels as pk
    from mrfa_tpu.ops.corr import corr_block_lookup_fast
    from mrfa_tpu.ops.resize import avg_pool

    bq = 4096
    h = w = 64
    rng = np.random.RandomState(0)
    corr = jnp.asarray(rng.randn(bq, h, w, 1).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1)
        .astype(np.float32)
    )
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))

    def wall(fn, *args, reps=5):
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        return (time.perf_counter() - t0) / reps

    import os as _os
    K = int(_os.environ.get("MRFA_PROBE_K", "21"))

    def report(name, make_scan):
        t1 = wall(make_scan(1), corr, coords)
        tk = wall(make_scan(K), corr, coords)
        print(f"{name:18s}: {(tk - t1) / (K - 1) * 1e3:8.3f} ms/op device "
              f"(T1={t1*1e3:.2f} ms incl dispatch, K={K})", flush=True)

    def scan_fwd(fn):
        def make(k):
            @jax.jit
            def run(corr, coords):
                def body(c, _):
                    out = fn(corr, c)
                    c = c + 1e-30 * out[:, :2]  # dependency, defeats CSE
                    return c, ()
                c, _ = jax.lax.scan(body, coords, None, length=k)
                return jnp.sum(c)
            return run
        return make

    def scan_bwd(fn):
        def make(k):
            @jax.jit
            def run(corr, coords):
                def body(c, _):
                    dcorr, dxy = fn(corr, c, g)
                    # touch BOTH outputs so neither branch is DCE'd
                    c = c + 1e-30 * dxy + 1e-30 * dcorr[:, 0, :2, 0]
                    return c, ()
                c, _ = jax.lax.scan(body, coords, None, length=k)
                return jnp.sum(c)
            return run
        return make

    def scan_pool(k):
        @jax.jit
        def run(corr, coords):
            def body(c, _):
                p = avg_pool(c, 2)
                c = c + 1e-30 * jnp.pad(
                    p, ((0, 0), (0, h // 2), (0, w // 2), (0, 0))
                )
                return c, ()
            c, _ = jax.lax.scan(body, corr, None, length=k)
            return jnp.sum(c)
        return run

    # v3 padded-levels inputs (pre-padded x-major, bf16 + f32 variants)
    c0t = jnp.transpose(corr[..., 0], (0, 2, 1))
    c1t = jnp.transpose(avg_pool(corr, 2)[..., 0], (0, 2, 1))
    zp = ((0, 0), (pk.PAD, pk.PAD), (0, 0))
    c0p = jnp.pad(c0t, zp)
    c1p = jnp.pad(c1t, zp)
    c0pb = c0p.astype(jnp.bfloat16)
    c1pb = c1p.astype(jnp.bfloat16)

    def scan_fwd_padded(fn, a0, a1):
        def make(k):
            @jax.jit
            def run(corr, coords):
                def body(c, _):
                    out = fn(a0, a1, c)
                    c = c + 1e-30 * out[:, :2].astype(jnp.float32)
                    return c, ()
                c, _ = jax.lax.scan(body, coords, None, length=k)
                return jnp.sum(c)
            return run
        return make

    report("avg_pool", lambda k: scan_pool(k))
    report("fwd pallas_v3 f32", scan_fwd_padded(
        lambda a, b, x: pk._corr_lookup_pallas_padded_impl(a, b, x), c0p, c1p
    ))
    report("fwd pallas_v3 bf16", scan_fwd_padded(
        lambda a, b, x: pk._corr_lookup_pallas_padded_impl(a, b, x), c0pb, c1pb
    ))
    report("fwd pallas_pret bf16", scan_fwd_padded(
        lambda a, b, x: pk._corr_lookup_pallas_pret_impl(a, b, x),
        c0t.astype(jnp.bfloat16), c1t.astype(jnp.bfloat16),
    ))
    report("fwd pallas_v2", scan_fwd(
        lambda c, x: pk._corr_lookup_pallas_v2_impl(c, x)
    ))
    report("fwd pallas_v1", scan_fwd(
        lambda c, x: pk._corr_lookup_pallas_impl(c, x)
    ))
    report("fwd xla_fast", scan_fwd(corr_block_lookup_fast))
    report("bwd pallas_v2", scan_bwd(
        lambda c, x, gg: pk._corr_lookup_pallas_v2_bwd_impl(c, x, gg)
    ))
    report("bwd pallas_v1", scan_bwd(
        lambda c, x, gg: pk._corr_lookup_pallas_bwd_impl(c, x, gg)
    ))


if __name__ == "__main__":
    main()
