"""Per-op honest timing probe for the correlation lookup kernels.

Methodology (hard-won; see CLAUDE.md benchmark-honesty notes):
  - DISTINCT inputs per call: repeated identical (executable, args) pairs
    through the axon tunnel report unrepresentative times (swings of 5..100
    ms were observed for the same op across runs).
  - Pipelined dispatch of N calls, then ONE device-side scalar reduction of
    the last output fetched to host: bounds completion of all N (in-order
    device execution) without charging the ~20-40 MB/s tunnel transfer of a
    large output to the op.

Usage: python tools/probe_lookup.py [fwd|bwd|both] [bq ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

N_CALLS = 20


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    bqs = [int(a) for a in sys.argv[2:]] or [256, 1024, 4096, 16384]

    from mrfa_tpu.ops.corr import corr_block_lookup
    from mrfa_tpu.ops import pallas_kernels as pk

    red = jax.jit(lambda xs: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(xs)))

    def timed(fn, argsets, label, bq):
        out = fn(*argsets[0])
        float(np.asarray(red(out)))
        t0 = time.perf_counter()
        for a in argsets:
            out = fn(*a)
        float(np.asarray(red(out)))
        dt = (time.perf_counter() - t0) / len(argsets)
        print(f"bq={bq:6d} {label:14s}: {dt*1e3:8.3f} ms ({dt/bq*1e9:7.1f} ns/q)")

    rng = np.random.RandomState(0)
    for bq in bqs:
        corrs = [
            jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
            for _ in range(N_CALLS)
        ]
        coordss = [
            jnp.asarray(
                np.stack(
                    [rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
                ).astype(np.float32)
            )
            for _ in range(N_CALLS)
        ]

        if mode in ("fwd", "both"):
            ref = np.asarray(corr_block_lookup(corrs[0], coordss[0]))
            for name, fn in (
                ("fwd pallas", pk._corr_lookup_pallas_impl),
                ("fwd pallas_v2", pk._corr_lookup_pallas_v2_impl),
            ):
                got = np.asarray(fn(corrs[0], coordss[0]))
                err = np.abs(got - ref).max()
                timed(fn, list(zip(corrs, coordss)), name, bq)
                print(f"           {name:14s}  max_err={err:.2e}")

        if mode in ("bwd", "both"):
            gs = [
                jnp.asarray(rng.randn(bq, 98).astype(np.float32))
                for _ in range(N_CALLS)
            ]
            for name, fn in (
                ("bwd pallas", pk._corr_lookup_pallas_bwd_impl),
                ("bwd pallas_v2", pk._corr_lookup_pallas_v2_bwd_impl),
            ):
                timed(fn, list(zip(corrs, coordss, gs)), name, bq)
            # exactness vs the gather vjp (AFTER timing: the gather vjp's
            # giant scatter graph perturbs subsequent timings)
            _, vjp = jax.vjp(corr_block_lookup, corrs[0], coordss[0])
            want_dc, want_dxy = jax.tree_util.tree_map(np.asarray, vjp(gs[0]))
            for name, fn in (
                ("bwd pallas", pk._corr_lookup_pallas_bwd_impl),
                ("bwd pallas_v2", pk._corr_lookup_pallas_v2_bwd_impl),
            ):
                dc, dxy = fn(corrs[0], coordss[0], gs[0])
                print(
                    f"           {name:14s}  err_dc="
                    f"{np.abs(np.asarray(dc)-want_dc).max():.2e} err_dxy="
                    f"{np.abs(np.asarray(dxy)-want_dxy).max():.2e}"
                )


if __name__ == "__main__":
    main()
