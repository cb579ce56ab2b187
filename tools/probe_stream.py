"""Isolate the Pallas pipeline's streaming/step overhead for the lookup.

Runs a NULL kernel with the exact same block specs as the patch-extract
kernel (streams the same bytes through VMEM) but trivial compute, plus the
avg_pool prep alone, at the current MRFA_LOOKUP_QB. If the null kernel costs
what the real kernel costs, the bottleneck is the pipeline, not compute.
"""
from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops import pallas_kernels as pk
    from mrfa_tpu.ops.resize import avg_pool

    QB = pk.QB
    PATCH = pk.PATCH
    bq = 4096
    h = w = 64
    N = 20
    red = jax.jit(lambda x: jnp.sum(x))

    rng = np.random.RandomState(0)
    corrs = [
        jnp.asarray(rng.randn(bq, h, w, 1).astype(np.float32)) for _ in range(N)
    ]
    coordss = [
        jnp.asarray(
            np.stack([rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1)
            .astype(np.float32)
        )
        for _ in range(N)
    ]

    def timed(fn, argsets, label):
        out = fn(*argsets[0])
        float(np.asarray(red(jax.tree_util.tree_leaves(out)[0])))
        t0 = time.perf_counter()
        for a in argsets:
            out = fn(*a)
        float(np.asarray(red(jax.tree_util.tree_leaves(out)[0])))
        dt = (time.perf_counter() - t0) / len(argsets)
        print(f"QB={QB:3d} {label:18s}: {dt*1e3:8.3f} ms")

    # 1. avg_pool prep alone
    timed(jax.jit(lambda c: avg_pool(c, 2)), [(c,) for c in corrs], "avg_pool")

    # 2. null kernel, same streaming as patch-extract
    def null_kernel(c0_ref, c1_ref, out_ref):
        n = QB * PATCH
        out_ref[0] = c0_ref[0:n, 0:PATCH]
        out_ref[1] = c1_ref[0:n, 0:PATCH]

    @jax.jit
    def null_stream(corr):
        c0 = corr[..., 0].reshape(bq * h, w)
        c1 = avg_pool(corr, 2)[..., 0].reshape(bq * (h // 2), w // 2)
        n = QB * PATCH
        return pl.pallas_call(
            null_kernel,
            grid=(bq // QB,),
            in_specs=[
                pl.BlockSpec((QB * h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (QB * (h // 2), w // 2), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (2, n, PATCH), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((2, bq * PATCH, PATCH), jnp.float32),
        )(c0, c1)

    timed(null_stream, [(c,) for c in corrs], "null stream+pool")

    # 3. null kernel streaming LEVEL-0 only (is the second operand the cost?)
    def null0_kernel(c0_ref, out_ref):
        n = QB * PATCH
        out_ref[0] = c0_ref[0:n, 0:PATCH]
        out_ref[1] = c0_ref[0:n, 0:PATCH]

    @jax.jit
    def null_stream0(corr):
        c0 = corr[..., 0].reshape(bq * h, w)
        n = QB * PATCH
        return pl.pallas_call(
            null0_kernel,
            grid=(bq // QB,),
            in_specs=[
                pl.BlockSpec((QB * h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, n, PATCH), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((2, bq * PATCH, PATCH), jnp.float32),
        )(c0)

    timed(null_stream0, [(c,) for c in corrs], "null stream l0")

    # 4. the real extract kernel
    timed(
        jax.jit(lambda c, x: pk._extract_patches(c, x)[0]),
        list(zip(corrs, coordss)),
        "extract",
    )

    # 5. full fwd
    timed(
        pk._corr_lookup_pallas_v2_impl, list(zip(corrs, coordss)), "fwd full"
    )


if __name__ == "__main__":
    main()
