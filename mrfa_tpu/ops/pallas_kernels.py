"""Pallas TPU kernels for the correlation-lookup hot path.

The XLA fast path (ops/corr.py) materializes a zero-padded (BQ, 80, 80) copy
of every query's correlation map per refinement iteration (~1.6x tile-padding
expansion, pure HBM traffic). This kernel streams (QB, 64, 64) map blocks
through VMEM (auto double-buffered by the Pallas pipeline), pads once in a
VMEM scratch, and emits both pyramid levels' 49-point windows directly —
no HBM-side padded intermediates at all.

Semantics are identical to ops/corr.corr_block_lookup (verified in
tests/test_corr.py, interpret mode): zeros padding, reference window-channel
order (x offset varies along the first window axis), two levels, radius 3.
The backward pass reuses the gather formulation's vjp (exact, scatter-add).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 3
WIN = 2 * RADIUS + 1  # 7
PATCH = 2 * RADIUS + 2  # 8
PAD = 2 * RADIUS + 2  # clamp margin (see ops/corr.py derivation)
QB = 8  # queries per grid step


def _level_sample(scratch, cx, cy, size):
    """Sample one level's 7x7 window from a zero-padded VMEM scratch.

    scratch: (size+2*PAD, size+2*PAD) padded map; cx, cy: scalar float coords.
    Returns (49,) in reference channel order.
    """
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0c = jnp.clip(x0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    y0c = jnp.clip(y0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    sx = x0c + PAD - RADIUS
    sy = y0c + PAD - RADIUS
    p8 = scratch[pl.ds(sy, PATCH), pl.ds(sx, PATCH)]  # (8, 8)
    q = (
        (1.0 - fx) * (1.0 - fy) * p8[:WIN, :WIN]
        + fx * (1.0 - fy) * p8[:WIN, 1:]
        + (1.0 - fx) * fy * p8[1:, :WIN]
        + fx * fy * p8[1:, 1:]
    )  # q[j, i] = sample at (x + i - r, y + j - r)
    return q.T.reshape(WIN * WIN)


def _corr_lookup_kernel(coords_ref, c0_ref, c1_ref, out_ref, s0, s1):
    # zero the scratch borders once; the interiors are overwritten per query
    @pl.when(pl.program_id(0) == 0)
    def _():
        s0[:, :] = jnp.zeros_like(s0)
        s1[:, :] = jnp.zeros_like(s1)

    h0 = c0_ref.shape[1]
    h1 = c1_ref.shape[1]
    for q in range(QB):  # static unroll over the query block
        s0[pl.ds(PAD, h0), pl.ds(PAD, h0)] = c0_ref[q]
        s1[pl.ds(PAD, h1), pl.ds(PAD, h1)] = c1_ref[q]
        cx = coords_ref[q, 0]
        cy = coords_ref[q, 1]
        out_ref[q, 0:WIN * WIN] = _level_sample(s0, cx, cy, h0)
        out_ref[q, WIN * WIN : 2 * WIN * WIN] = _level_sample(
            s1, cx * 0.5, cy * 0.5, h1
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_impl(corr, coords, interpret=False):
    from mrfa_tpu.ops.resize import avg_pool

    bq, h, w, _ = corr.shape
    c0 = corr[..., 0]
    c1 = avg_pool(corr, 2)[..., 0]  # level-1 pooled maps
    assert bq % QB == 0, f"query count {bq} must be a multiple of {QB}"
    grid = (bq // QB,)
    out = pl.pallas_call(
        _corr_lookup_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB, h // 2, w // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (QB, 2 * WIN * WIN), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, 2 * WIN * WIN), corr.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * PAD, w + 2 * PAD), corr.dtype),
            pltpu.VMEM((h // 2 + 2 * PAD, w // 2 + 2 * PAD), corr.dtype),
        ],
        interpret=interpret,
    )(coords, c0, c1)
    return out


@jax.custom_vjp
def corr_block_lookup_pallas(corr: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas correlation pyramid lookup (2 levels, r=3).

    Args:
      corr: (BQ, hs, ws, 1) per-query correlation maps; BQ % 8 == 0.
      coords: (BQ, 2) query centers in level-0 source pixel coords (xy).

    Returns:
      (BQ, 98), identical to ops/corr.corr_block_lookup.
    """
    return _corr_lookup_pallas_impl(corr, coords)


def _pl_fwd(corr, coords):
    return _corr_lookup_pallas_impl(corr, coords), (corr, coords)


def _pl_bwd(res, g):
    from mrfa_tpu.ops.corr import corr_block_lookup

    corr, coords = res
    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    return vjp(g)


corr_block_lookup_pallas.defvjp(_pl_fwd, _pl_bwd)
