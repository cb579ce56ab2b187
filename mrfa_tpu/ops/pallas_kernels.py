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
# queries per grid step: large enough that per-step DMAs amortize their
# issue overhead (measured at 4096 queries on v5e: fwd 42/3.4/3.4 ms and
# bwd 40/6.7/6.6 ms for QB=8/16/32) — QB=16 hits the knee with half the
# VMEM footprint of 32
QB = 16


def _pad_queries(bq):
    """Padded query count (multiple of QB) and the pad amount."""
    rem = bq % QB
    pad = 0 if rem == 0 else QB - rem
    return bq + pad, pad


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
    bq_p, qpad = _pad_queries(bq)
    if qpad:
        c0t = jnp.pad(c0t, ((0, qpad), (0, 0), (0, 0)))
        c1t = jnp.pad(c1t, ((0, qpad), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, qpad), (0, 0)))
    grid = (bq_p // QB,)
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
        out_shape=jax.ShapeDtypeStruct((bq_p, 2, WIN, WIN), corr.dtype),
        scratch_shapes=[
            pltpu.VMEM((w + 2 * PAD, h + 2 * PAD), corr.dtype),
            pltpu.VMEM((w // 2 + 2 * PAD, h // 2 + 2 * PAD), corr.dtype),
        ],
        interpret=interpret,
    )(coords, c0t, c1t)
    return out[:bq].reshape(bq, 2 * WIN * WIN).astype(in_dtype)


def _level_grad_t(scratch_t, g_tile, cx, cy, size):
    """Backward of _level_sample_t for one query and one level.

    Computes the cotangent patch d8 = dL/d(p8t), scatters it into the
    query's own transposed map (no cross-query collisions: each query owns
    its map row of the (BQ, H, W) stack), and returns (d_map_t, dcx, dcy).
    """
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0c = jnp.clip(x0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    y0c = jnp.clip(y0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    sx = x0c + PAD - RADIUS
    sy = y0c + PAD - RADIUS
    hpad = scratch_t.shape[1]

    # --- re-slice the forward patch for the coordinate gradient ---
    band = scratch_t[pl.ds(sx, PATCH), :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (hpad, PATCH), 0)
    sel_ids = sy + jax.lax.broadcasted_iota(jnp.int32, (hpad, PATCH), 1)
    onehot = (col_ids == sel_ids).astype(band.dtype)  # (hpad, 8)
    p8t = jax.lax.dot_general(
        band, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # a.e. derivatives of the bilinear blend (standard grid_sample vjp)
    ddx = (1.0 - fy) * (p8t[1:, :WIN] - p8t[:WIN, :WIN]) + fy * (
        p8t[1:, 1:] - p8t[:WIN, 1:]
    )
    ddy = (1.0 - fx) * (p8t[:WIN, 1:] - p8t[:WIN, :WIN]) + fx * (
        p8t[1:, 1:] - p8t[1:, :WIN]
    )
    dcx = jnp.sum(g_tile * ddx)
    dcy = jnp.sum(g_tile * ddy)

    # --- cotangent patch: blend the 4 shifted copies of g into (8, 8) ---
    zc = jnp.zeros((PATCH, 1), dtype=g_tile.dtype)
    zr = jnp.zeros((1, WIN), dtype=g_tile.dtype)
    g_dn = jnp.concatenate([g_tile, zr], axis=0)  # (8, 7), g in rows 0..6
    g_up = jnp.concatenate([zr, g_tile], axis=0)  # (8, 7), g in rows 1..7
    d8 = (
        (1.0 - fx) * (1.0 - fy) * jnp.concatenate([g_dn, zc], axis=1)
        + fx * (1.0 - fy) * jnp.concatenate([g_up, zc], axis=1)
        + (1.0 - fx) * fy * jnp.concatenate([zc, g_dn], axis=1)
        + fx * fy * jnp.concatenate([zc, g_up], axis=1)
    )
    # scatter d8 straight into the (size, size) transposed map with two
    # one-hot matmuls: d_map_t[x, y] = d8[x-(x0c-3), y-(y0c-3)]. Taps that
    # fall outside the real map drop automatically (no matching one-hot
    # row) — same semantics as the zero-pad crop, but with no scratch
    # zeroing, no lane-offset slicing, and pure MXU work.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (size, PATCH), 0)
    sel_x = (x0c - RADIUS) + jax.lax.broadcasted_iota(
        jnp.int32, (size, PATCH), 1
    )
    s_x = (row_ids == sel_x).astype(d8.dtype)  # (size, 8)
    sel_y = (y0c - RADIUS) + jax.lax.broadcasted_iota(
        jnp.int32, (size, PATCH), 1
    )
    s_y = (row_ids == sel_y).astype(d8.dtype)  # (size, 8)
    left = jax.lax.dot_general(
        s_x, d8, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (size, 8)
    d_map = jax.lax.dot_general(
        left, s_y, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (size, size)
    return d_map, dcx, dcy


def _corr_lookup_bwd_kernel(
    coords_ref, g_ref, c0t_ref, c1t_ref,
    d0t_ref, d1t_ref, dc_ref,
    s0, s1,
):
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
        d0, dcx0, dcy0 = _level_grad_t(s0, g_ref[q, 0], cx, cy, h0)
        d1, dcx1, dcy1 = _level_grad_t(s1, g_ref[q, 1], cx * 0.5, cy * 0.5, h1)
        d0t_ref[q] = d0
        d1t_ref[q] = d1
        dc_ref[q, 0] = dcx0 + 0.5 * dcx1
        dc_ref[q, 1] = dcy0 + 0.5 * dcy1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_bwd_impl(corr, coords, g, interpret=False):
    from mrfa_tpu.ops.resize import avg_pool

    bq, h, w, _ = corr.shape
    corr32 = corr.astype(jnp.float32)
    c0t = jnp.transpose(corr32[..., 0], (0, 2, 1))
    c1t = jnp.transpose(avg_pool(corr32, 2)[..., 0], (0, 2, 1))
    g = g.astype(jnp.float32).reshape(bq, 2, WIN, WIN)
    bq_p, qpad = _pad_queries(bq)
    if qpad:
        c0t = jnp.pad(c0t, ((0, qpad), (0, 0), (0, 0)))
        c1t = jnp.pad(c1t, ((0, qpad), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, qpad), (0, 0)))
        g = jnp.pad(g, ((0, qpad), (0, 0), (0, 0), (0, 0)))
    grid = (bq_p // QB,)
    d0t, d1t, dc = pl.pallas_call(
        _corr_lookup_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB, 2, WIN, WIN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((QB, w, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB, w // 2, h // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((QB, w, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB, w // 2, h // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            # scalar per-query coord grads: Mosaic cannot store scalars to
            # VMEM, so this output lives in SMEM
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bq_p, w, h), jnp.float32),
            jax.ShapeDtypeStruct((bq_p, w // 2, h // 2), jnp.float32),
            jax.ShapeDtypeStruct((bq_p, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((w + 2 * PAD, h + 2 * PAD), jnp.float32),
            pltpu.VMEM((w // 2 + 2 * PAD, h // 2 + 2 * PAD), jnp.float32),
        ],
        interpret=interpret,
    )(coords, g, c0t, c1t)
    # un-transpose and fold the level-1 cotangent through avg_pool's
    # transpose (each source pixel receives d_l1[y//2, x//2] / 4)
    d0t, d1t, dc = d0t[:bq], d1t[:bq], dc[:bq]
    d0 = jnp.transpose(d0t, (0, 2, 1))
    d1 = jnp.transpose(d1t, (0, 2, 1))
    d1_up = jnp.repeat(jnp.repeat(d1, 2, axis=1), 2, axis=2) * 0.25
    d_corr = (d0 + d1_up)[..., None].astype(corr.dtype)
    return d_corr, dc.astype(coords.dtype)


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
    corr, coords = res
    return _corr_lookup_pallas_bwd_impl(corr, coords, g)


corr_block_lookup_pallas.defvjp(_pl_fwd, _pl_bwd)
