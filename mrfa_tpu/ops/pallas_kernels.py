"""Pallas TPU kernels for the correlation-lookup hot path.

The XLA fast path (ops/corr.py) materializes a zero-padded (BQ, 80, 80) copy
of every query's correlation map per refinement iteration (~1.6x tile-padding
expansion, pure HBM traffic). This kernel streams (QB, 64, 64) map blocks
through VMEM (auto double-buffered by the Pallas pipeline), pads once in a
VMEM scratch, and emits both pyramid levels' 49-point windows directly —
no HBM-side padded intermediates at all.

Mosaic-specific shaping: the lane (last) dimension cannot be dynamically
sliced or reshaped, so (a) maps are pre-transposed outside the kernel and the
dynamic slice runs on sublanes (the x axis), (b) the 8 window columns are
gathered by a one-hot selection matmul, and (c) outputs are written as 2-D
(7, 7) tiles per level and flattened outside.

Semantics are identical to ops/corr.corr_block_lookup (verified in
tests/test_corr.py + tests/test_pallas.py): zeros padding, reference window
channel order (c = i*7 + j samples (x+i-3, y+j-3)), two levels, radius 3.
The backward pass reuses the gather formulation's vjp (exact scatter-add).
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


def _level_sample_t(scratch_t, cx, cy, size):
    """7x7 window from a zero-padded TRANSPOSED map scratch (x rows, y cols).

    Returns (7, 7) with [i, j] = bilinear sample at (x + i - r, y + j - r) —
    the reference channel order after row-major flattening.
    """
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0c = jnp.clip(x0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    y0c = jnp.clip(y0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    sx = x0c + PAD - RADIUS
    sy = y0c + PAD - RADIUS
    band = scratch_t[pl.ds(sx, PATCH), :]  # (8, size+2*PAD): rows = x
    hpad = scratch_t.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (hpad, PATCH), 0)
    sel_ids = sy + jax.lax.broadcasted_iota(jnp.int32, (hpad, PATCH), 1)
    onehot = (col_ids == sel_ids).astype(band.dtype)  # (hpad, 8)
    # one-hot selection; HIGHEST precision (bf16x3 passes, 24 mantissa bits)
    # keeps the pass-through values bit-exact, unlike the default MXU path
    p8t = jax.lax.dot_general(
        band, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # p8t[i, j] = map[y0c-3+j, x0c-3+i]
    return (
        (1.0 - fx) * (1.0 - fy) * p8t[:WIN, :WIN]
        + fx * (1.0 - fy) * p8t[1:, :WIN]
        + (1.0 - fx) * fy * p8t[:WIN, 1:]
        + fx * fy * p8t[1:, 1:]
    )


def _corr_lookup_kernel(coords_ref, c0t_ref, c1t_ref, out_ref, s0, s1):
    # zero the scratch borders once; interiors are overwritten per query
    @pl.when(pl.program_id(0) == 0)
    def _():
        s0[:, :] = jnp.zeros_like(s0)
        s1[:, :] = jnp.zeros_like(s1)

    h0 = c0t_ref.shape[1]
    h1 = c1t_ref.shape[1]
    for q in range(QB):  # static unroll over the query block
        s0[pl.ds(PAD, h0), pl.ds(PAD, h0)] = c0t_ref[q]
        s1[pl.ds(PAD, h1), pl.ds(PAD, h1)] = c1t_ref[q]
        cx = coords_ref[q, 0]
        cy = coords_ref[q, 1]
        out_ref[q, 0] = _level_sample_t(s0, cx, cy, h0)
        out_ref[q, 1] = _level_sample_t(s1, cx * 0.5, cy * 0.5, h1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_impl(corr, coords, interpret=False):
    from mrfa_tpu.ops.resize import avg_pool

    bq, h, w, _ = corr.shape
    # the kernel runs in f32: Mosaic cannot dynamic-slice 8 sublanes of a
    # bf16 array (2-row packing); the boundary casts are bandwidth-trivial
    in_dtype = corr.dtype
    corr = corr.astype(jnp.float32)
    c0t = jnp.transpose(corr[..., 0], (0, 2, 1))  # x-major maps
    c1t = jnp.transpose(avg_pool(corr, 2)[..., 0], (0, 2, 1))
    assert bq % QB == 0, f"query count {bq} must be a multiple of {QB}"
    grid = (bq // QB,)
    out = pl.pallas_call(
        _corr_lookup_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB, w, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB, w // 2, h // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (QB, 2, WIN, WIN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, 2, WIN, WIN), corr.dtype),
        scratch_shapes=[
            pltpu.VMEM((w + 2 * PAD, h + 2 * PAD), corr.dtype),
            pltpu.VMEM((w // 2 + 2 * PAD, h // 2 + 2 * PAD), corr.dtype),
        ],
        interpret=interpret,
    )(coords, c0t, c1t)
    return out.reshape(bq, 2 * WIN * WIN).astype(in_dtype)


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
