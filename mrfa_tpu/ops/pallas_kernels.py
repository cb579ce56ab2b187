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
# queries per grid step (tunable for probing via MRFA_LOOKUP_QB)
import os as _os

QB = int(_os.environ.get("MRFA_LOOKUP_QB", "16"))


def _pad_queries(bq):
    """Padded query count (multiple of QB) and the pad amount."""
    rem = bq % QB
    pad = 0 if rem == 0 else QB - rem
    return bq + pad, pad


def _level_sample_t(scratch_t, cx, cy, size):
    """7x7 window from a TRANSPOSED map scratch (x rows padded, y cols raw).

    The scratch is padded ONLY on the sublane (x) axis — the dynamic band
    slice needs real rows there. The lane (y) axis carries the map columns
    unpadded: out-of-range y taps fold into the one-hot selection (a target
    outside [0, size) matches no column -> exact zeros), so the per-query
    scratch write is a full-width, lane-ALIGNED store (the old (PAD, PAD)
    interior write was lane-misaligned and dominated kernel time).

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
    sy = y0c - RADIUS  # raw y target: OOB columns select nothing
    band = scratch_t[pl.ds(sx, PATCH), :]  # (8, size): rows = x
    h = scratch_t.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, PATCH), 0)
    sel_ids = sy + jax.lax.broadcasted_iota(jnp.int32, (h, PATCH), 1)
    onehot = (col_ids == sel_ids).astype(band.dtype)  # (h, 8)
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
        # per-tile convert at the scratch write: bf16 maps stream from HBM
        # at half the traffic; dynamic sublane slicing (which Mosaic cannot
        # do on 2-row-packed bf16) only ever touches the f32 scratch. The
        # write targets (PAD, 0) — sublane-offset only, lane-aligned.
        s0[pl.ds(PAD, h0), :] = c0t_ref[q].astype(s0.dtype)
        s1[pl.ds(PAD, h1), :] = c1t_ref[q].astype(s1.dtype)
        cx = coords_ref[q, 0]
        cy = coords_ref[q, 1]
        out_ref[q, 0] = _level_sample_t(s0, cx, cy, h0)
        out_ref[q, 1] = _level_sample_t(s1, cx * 0.5, cy * 0.5, h1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_pret_impl(c0t, c1t, coords, interpret=False):
    """Lookup over PRE-TRANSPOSED pyramid levels: zero XLA-side map prep.

    c0t: (BQ, w, h) x-major level-0 maps; c1t: (BQ, w/2, h/2) x-major
    level-1 maps. The refinement loop produces these directly as einsums
    against x-major / pooled-x-major source features (models/raft.py), so
    the cast/transpose/pool of the (4096, 4096) volume that dominated the
    frame profile disappears entirely.
    """
    bq, w, h = c0t.shape
    assert h == w, "correlation maps must be square (RaftFlow invariant)"
    out_dtype = c0t.dtype
    # maps stream into the kernel in their own dtype (bf16 under the
    # compute policy = half the HBM read traffic, and no XLA-side f32
    # materialization of the frame's largest intermediate); the kernel
    # converts per-tile at the f32 scratch write
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
        out_shape=jax.ShapeDtypeStruct((bq_p, 2, WIN, WIN), jnp.float32),
        scratch_shapes=[
            # x (sublane) axis padded for the dynamic band slice; y (lane)
            # axis unpadded — OOB y taps fold into the one-hot selection
            pltpu.VMEM((w + 2 * PAD, h), jnp.float32),
            pltpu.VMEM((w // 2 + 2 * PAD, h // 2), jnp.float32),
        ],
        interpret=interpret,
    )(coords, c0t, c1t)
    return out[:bq].reshape(bq, 2 * WIN * WIN).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_impl(corr, coords, interpret=False):
    """Lookup from per-query y-major maps: transpose/pool prep + pret kernel."""
    from mrfa_tpu.ops.resize import avg_pool

    corr32 = corr.astype(jnp.float32)
    c0t = jnp.transpose(corr32[..., 0], (0, 2, 1))  # x-major maps
    c1t = jnp.transpose(avg_pool(corr32, 2)[..., 0], (0, 2, 1))
    return _corr_lookup_pallas_pret_impl(c0t, c1t, coords, interpret).astype(
        corr.dtype
    )


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


# ---------------------------------------------------------------------------
# v2: copy-free patch-extract / patch-scatter kernels
#
# The v1 kernels above copy every query's full map into a zero-padded VMEM
# scratch before slicing (two VMEM->VMEM copies per query, ~70% of kernel
# time by the round-2 device profile). v2 eliminates the copies:
#   - maps are zero-padded on the SUBLANE (x) axis only, once, in XLA (a
#     fused pad; lane layout untouched so no relayout), and handed to the
#     kernel as a 2-D (BQ*(w+2*PAD), h) array so each query's band is a
#     plain dynamic sublane slice of the streamed block,
#   - lane-axis (y) out-of-bounds handling folds into the one-hot selection
#     matmul for free (selector columns outside [0, h) match no row),
#   - all per-query scalar math (floor/clip/fractions) is precomputed
#     vectorized in XLA and read back as SMEM scalars,
#   - the kernel emits raw (8, 8) integer patches; the bilinear blend (fwd)
#     and the cotangent-patch build + coordinate grads (bwd) are vectorized
#     XLA over all queries.
# The backward scatter writes each query's widened (8, h) cotangent rows at
# a dynamic sublane offset into its own zeroed padded slab — replacing the
# v1 per-query (h, h) scatter matmuls that made the MXU latency-bound.
# ---------------------------------------------------------------------------


def _prep_level(coords, size):
    """Vectorized per-query index math for one pyramid level (XLA side).

    Returns (trow, tcol, fx, fy):
      trow (BQ, 8) int32 — per-(query, y-tap) SOURCE ROW target inside the
        query's in-block slab: (q % QB) * size + (y0 - 3 + jy), or -1 when
        the tap row is out of bounds (the one-hot then selects nothing).
      tcol (BQ, 8) int32 — per-(query, x-tap) column target x0 - 3 + jx
        (OOB values select no column).
      fx, fy (BQ,) — bilinear fractions.
    """
    cx = coords[:, 0]
    cy = coords[:, 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(jnp.float32)
    fy = (cy - y0).astype(jnp.float32)
    x0c = jnp.clip(x0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    y0c = jnp.clip(y0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    off8 = jnp.arange(PATCH, dtype=jnp.int32)
    bq = coords.shape[0]
    qb = (jnp.arange(bq, dtype=jnp.int32) % QB)[:, None]
    yy = (y0c - RADIUS)[:, None] + off8[None, :]  # (BQ, 8) tap rows
    trow = jnp.where((yy >= 0) & (yy < size), qb * size + yy, -1)
    tcol = (x0c - RADIUS)[:, None] + off8[None, :]
    return trow, tcol, fx, fy


def _maps_2d(corr32):
    """Both pyramid levels as flat (BQ*size, size) row stacks — zero-copy
    for level 0 (a reshape of the native NHWC maps), one avg_pool for
    level 1. No transposes, no padding: out-of-bounds handling lives in
    the one-hot selection targets.
    """
    from mrfa_tpu.ops.resize import avg_pool

    bq, h, w, _ = corr32.shape
    c0 = corr32[..., 0].reshape(bq * h, w)
    c1 = avg_pool(corr32, 2)[..., 0].reshape(bq * (h // 2), w // 2)
    return c0, c1, h, w


def _onehot_cols(ybase, size, dtype):
    """(size, PATCH) one-hot: row y selects column j iff y == ybase + j."""
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (size, PATCH), 0)
    sel_ids = ybase + jax.lax.broadcasted_iota(jnp.int32, (size, PATCH), 1)
    return (col_ids == sel_ids).astype(dtype)


def _block_diag_mask(n, dtype):
    """(QB*8, QB*8) mask keeping the per-query diagonal 8x8 blocks."""
    rq = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // PATCH
    cq = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // PATCH
    return (rq == cq).astype(dtype)


def _diag_gather(n, dtype):
    """(QB*8, 8): D[q*8+j, j] = 1 — extracts/expands per-query 8-columns."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, PATCH), 0) % PATCH
    c = jax.lax.broadcasted_iota(jnp.int32, (n, PATCH), 1)
    return (r == c).astype(dtype)


def _colsel(tgt_row, w, dtype):
    """(w, QB*8) selection: S[x, c] = (x == tgt[c]); OOB targets drop."""
    x_ids = jax.lax.broadcasted_iota(jnp.int32, (w, tgt_row.shape[0]), 0)
    return (x_ids == tgt_row[None, :]).astype(dtype)


def _rowsel(trow, nrows, dtype):
    """(n, nrows) one-hot row selection: R[r, src] = (src == trow[r]).

    trow is an (n,) int32 vector; -1 targets select nothing.
    """
    src_ids = jax.lax.broadcasted_iota(jnp.int32, (trow.shape[0], nrows), 1)
    return (src_ids == trow[:, None]).astype(dtype)


def _patch_extract_kernel(tr0_ref, tr1_ref, t0_ref, t1_ref, c0_ref, c1_ref, out_ref):
    """Fully matmul-form patch extraction — zero dynamic slices.

    Per-query dynamic-offset VMEM slices cost ~350 ns each on v5e and
    dominated every slice-based variant (~700 ns/query regardless of how
    little else the kernel did). Here ALL selection is one-hot matmuls over
    the whole 16-query block:
      bands   = rowsel (n, QB*h) @ maps (QB*h, w)          [y taps, 1 MXU op]
      p_full  = bands @ colsel (w, n)                      [x taps, 1 MXU op]
      patches = dg^T-contracted (p_full * blockdiag_mask)  [1 MXU op]
    The mask keeps each query's own 8 columns. OOB taps carry target -1 /
    out-of-range and select nothing -> exact grid_sample zeros semantics,
    with NO map padding (level-0 maps stream zero-copy from the NHWC
    correlation stack). HIGHEST precision keeps f32 pass-through exact.
    Maps may arrive bf16 (the training compute dtype): converted per-block
    here; all selection math runs f32.

    ALL host-side buffer shapes are chosen padding-free for the TPU (8, 128)
    tiling — (n, 1) columns pad 128x and (.., 8) lane tails pad 16x, which
    blew the b=10 train step past HBM (round-3 OOM):
    tr0/tr1_ref: (n_blocks, QB*8) int32 per-(query, row-tap) source-row
      targets (resident; row = block).
    t0/t1_ref: (n_blocks, QB*8) int32 col-targets (resident; row = block).
    out_ref: (2, 8, QB*8): out[l, j_col, q*8+j_row] = tap value of level l;
      zeros when out of bounds.
    """
    n = QB * PATCH
    blk = pl.program_id(0)
    mask = _block_diag_mask(n, jnp.float32)
    dg = _diag_gather(n, jnp.float32)
    for l, (tr_ref, tc_ref, c_ref) in enumerate(
        ((tr0_ref, t0_ref, c0_ref), (tr1_ref, t1_ref, c1_ref))
    ):
        w = c_ref.shape[1]
        trow = tr_ref[pl.ds(blk, 1), :][0, :]  # (n,) this block's row targets
        bands = jax.lax.dot_general(
            _rowsel(trow, c_ref.shape[0], jnp.float32),
            c_ref[:, :].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (n, w): bands[q*8+jr, :] = map_q row (r0-3+jr), zeros if OOB
        tgt = tc_ref[pl.ds(blk, 1), :][0, :]  # (n,) this block's col targets
        p_full = jax.lax.dot_general(
            bands, _colsel(tgt, w, jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (n, n)
        out_ref[l] = jax.lax.dot_general(
            dg, p_full * mask, (((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (8, n): [j_col, q*8+j_row]


def _prep_targets(corr32, coords):
    """Shared XLA-side prep for both kernels: flat maps + padded targets.

    Returns (c0, c1, tr0, tr1, t0, t1, fx, fy, h, w, bq_p) with targets
    query-padded and laid out for the kernels' block specs.
    """
    bq, h, w, _ = corr32.shape
    assert h == w, "correlation maps must be square (RaftFlow invariant)"
    c0, c1, h, w = _maps_2d(corr32)
    tr0, tc0, fx0, fy0 = _prep_level(coords, h)
    tr1, tc1, fx1, fy1 = _prep_level(coords * 0.5, h // 2)
    bq_p, qpad = _pad_queries(bq)
    if qpad:
        # pad targets with -1 (select nothing -> zero patches / no scatter)
        pad8 = ((0, qpad), (0, 0))
        tr0 = jnp.pad(tr0, pad8, constant_values=-1)
        tr1 = jnp.pad(tr1, pad8, constant_values=-1)
        tc0 = jnp.pad(tc0, pad8, constant_values=-1)
        tc1 = jnp.pad(tc1, pad8, constant_values=-1)
        c0 = jnp.pad(c0, ((0, qpad * h), (0, 0)))
        c1 = jnp.pad(c1, ((0, qpad * (h // 2)), (0, 0)))
    n = QB * PATCH
    tr0 = tr0.reshape(-1, n)  # (n_blocks, QB*8) — padding-free layout
    tr1 = tr1.reshape(-1, n)
    t0 = tc0.reshape(-1, n)  # (n_blocks, QB*8)
    t1 = tc1.reshape(-1, n)
    fx = jnp.stack([fx0, fx1], axis=-1)
    fy = jnp.stack([fy0, fy1], axis=-1)
    return c0, c1, tr0, tr1, t0, t1, fx, fy, h, w, bq_p


def _extract_patches(corr32, coords, interpret=False):
    """Run the patch-extract kernel; returns (p8, fx, fy) with
    p8 (BQ, 2, 8, 8) in [y, x] patch layout and fx/fy (BQ, 2) per-level
    bilinear fractions."""
    bq = corr32.shape[0]
    c0, c1, tr0, tr1, t0, t1, fx, fy, h, w, bq_p = _prep_targets(corr32, coords)
    n = QB * PATCH
    nblk = bq_p // QB
    stacked = pl.pallas_call(
        _patch_extract_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB * h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB * (h // 2), w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, PATCH, n), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, PATCH, bq_p * PATCH), jnp.float32),
        interpret=interpret,
    )(tr0, tr1, t0, t1, c0, c1)
    # stacked[l, j_col, q*8+j_row] -> p8[q, l, j_row, j_col]
    p8 = jnp.transpose(
        stacked.reshape(2, PATCH, bq_p, PATCH), (2, 0, 3, 1)
    )[:bq]  # (BQ, 2, 8, 8)
    return p8, fx, fy


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_v2_impl(corr, coords, interpret=False):
    in_dtype = corr.dtype
    p8, fx, fy = _extract_patches(corr.astype(jnp.float32), coords, interpret)
    # bilinear blend over all queries/levels at once (pure VPU, one fusion);
    # p8 is [y, x]: fy blends the sublane (j) axis, fx the lane (i) axis
    w00 = ((1.0 - fx) * (1.0 - fy))[..., None, None]
    wx = (fx * (1.0 - fy))[..., None, None]
    wy = ((1.0 - fx) * fy)[..., None, None]
    w11 = (fx * fy)[..., None, None]
    out = (
        w00 * p8[..., :WIN, :WIN]
        + wx * p8[..., :WIN, 1:]
        + wy * p8[..., 1:, :WIN]
        + w11 * p8[..., 1:, 1:]
    )  # (BQ, 2, 7, 7) [y, x]
    # reference channel order is x-major (c = i*7 + j): swap to [x, y]
    out = jnp.swapaxes(out, -1, -2)
    return out.reshape(coords.shape[0], 2 * WIN * WIN).astype(in_dtype)


def _patch_scatter_kernel(tr0_ref, tr1_ref, t0_ref, t1_ref, d8_ref, d0_ref, d1_ref):
    """Matmul-form cotangent scatter (exact transpose of the extract kernel).

    All 16 queries' (8, 8) cotangent patches are widened over the col axis
    (expand 8 columns -> block columns, mask the block-diagonal, multiply
    by colsel; col-OOB targets drop), then scattered over rows by the
    TRANSPOSED row-selection matmul — which also writes the zeros
    everywhere else, so no zeroing pass and no dynamic writes exist.

    tr0/tr1/t0/t1_ref: (n_blocks, QB*8) int32 targets (resident; row = blk).
    d8_ref: (2, 8, QB*8) cotangent patches, [l, j_col, q*8+j_row] —
      padding-free lane layout (the old (2, QB*8, 8) shape padded 16x in
      HBM and OOM'd the b=10 train step).
    d0/d1_ref: (QB*size, size) per-query cotangent maps (unpadded), in the
      input maps' dtype.
    """
    n = QB * PATCH
    blk = pl.program_id(0)
    mask = _block_diag_mask(n, jnp.float32)
    dg = _diag_gather(n, jnp.float32)
    for l, (tr_ref, tc_ref, dref) in enumerate(
        ((tr0_ref, t0_ref, d0_ref), (tr1_ref, t1_ref, d1_ref))
    ):
        w = dref.shape[1]
        tgt = tc_ref[pl.ds(blk, 1), :][0, :]  # (n,) this block's col targets
        expand_t = jax.lax.dot_general(
            dg, d8_ref[l], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (n, n): expand_t[c, q*8+jr] = d8[l, c % 8, q*8+jr]
        widened_t = jax.lax.dot_general(
            _colsel(tgt, w, jnp.float32), expand_t * mask,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (w, n): widened_t[x, q*8+jr] = d8_q[jc, jr] at x = c0-3+jc
        trow = tr_ref[pl.ds(blk, 1), :][0, :]
        dref[:, :] = jax.lax.dot_general(
            _rowsel(trow, dref.shape[0], jnp.float32), widened_t,
            (((0,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(dref.dtype)  # (QB*size, w): d[src, x] = widened[r, x]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_v2_bwd_impl(corr, coords, g, interpret=False):
    bq, h, w, _ = corr.shape
    corr32 = corr.astype(jnp.float32)
    # g arrives x-major (reference channel order); swap to the kernel's
    # native [y, x] patch layout
    g = jnp.swapaxes(
        g.astype(jnp.float32).reshape(bq, 2, WIN, WIN), -1, -2
    )

    # recompute the integer patches (cheap) for the coordinate gradients
    p8, fx, fy = _extract_patches(corr32, coords, interpret)
    fxb = fx[..., None, None]
    fyb = fy[..., None, None]
    # a.e. derivatives of the bilinear blend (standard grid_sample vjp);
    # p8 is [y, x]: x-differences run along lanes, y along sublanes
    ddx = (1.0 - fyb) * (p8[..., :WIN, 1:] - p8[..., :WIN, :WIN]) + fyb * (
        p8[..., 1:, 1:] - p8[..., 1:, :WIN]
    )
    ddy = (1.0 - fxb) * (p8[..., 1:, :WIN] - p8[..., :WIN, :WIN]) + fxb * (
        p8[..., 1:, 1:] - p8[..., :WIN, 1:]
    )
    dcxl = jnp.sum(g * ddx, axis=(-1, -2))  # (BQ, 2) per-level dcx
    dcyl = jnp.sum(g * ddy, axis=(-1, -2))
    dc = jnp.stack(
        [dcxl[:, 0] + 0.5 * dcxl[:, 1], dcyl[:, 0] + 0.5 * dcyl[:, 1]], axis=-1
    )

    # cotangent patches d8[j, i] = sum_ab w_ab g[j-a, i-b] (BQ, 2, 8, 8)
    w00 = ((1.0 - fx) * (1.0 - fy))[..., None, None]
    wx = (fx * (1.0 - fy))[..., None, None]  # shift along i (x, lanes)
    wy = ((1.0 - fx) * fy)[..., None, None]  # shift along j (y, sublanes)
    w11 = (fx * fy)[..., None, None]
    d8 = (
        w00 * jnp.pad(g, ((0, 0), (0, 0), (0, 1), (0, 1)))
        + wx * jnp.pad(g, ((0, 0), (0, 0), (0, 1), (1, 0)))
        + wy * jnp.pad(g, ((0, 0), (0, 0), (1, 0), (0, 1)))
        + w11 * jnp.pad(g, ((0, 0), (0, 0), (1, 0), (1, 0)))
    )

    _, _, tr0, tr1, t0, t1, _, _, h, w, bq_p = _prep_targets(corr32, coords)
    # level-major TRANSPOSED layout for the kernel: (2, 8, BQ*8) — lanes are
    # the (query, row-tap) axis, so no (.., 8) lane-tail padding in HBM
    d8s = jnp.transpose(d8, (1, 3, 0, 2)).reshape(2, PATCH, bq * PATCH)
    qpad = bq_p - bq
    if qpad:
        d8s = jnp.pad(d8s, ((0, 0), (0, 0), (0, qpad * PATCH)))
    n = QB * PATCH
    nblk = bq_p // QB
    d0p, d1p = pl.pallas_call(
        _patch_scatter_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, PATCH, n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((QB * h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB * (h // 2), w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bq_p * h, w), jnp.float32),
            jax.ShapeDtypeStruct((bq_p * (h // 2), w // 2), jnp.float32),
        ),
        interpret=interpret,
    )(tr0, tr1, t0, t1, d8s)
    # outputs are already in the native unpadded map layout; fold the
    # level-1 cotangent through avg_pool's transpose (each source pixel
    # receives d_l1[y//2, x//2] / 4)
    d0 = d0p.reshape(bq_p, h, w)[:bq]
    d1 = d1p.reshape(bq_p, h // 2, w // 2)[:bq]
    d1_up = jnp.repeat(jnp.repeat(d1, 2, axis=1), 2, axis=2) * 0.25
    d_corr = (d0 + d1_up)[..., None].astype(corr.dtype)
    return d_corr, dc.astype(coords.dtype)


@jax.custom_vjp
def corr_block_lookup_pallas(corr: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas correlation pyramid lookup (2 levels, r=3).

    Args:
      corr: (BQ, hs, ws, 1) per-query correlation maps.
      coords: (BQ, 2) query centers in level-0 source pixel coords (xy).

    Returns:
      (BQ, 98), identical to ops/corr.corr_block_lookup.

    Implementation selection is by measured DEVICE time at 4096 queries on
    v5e (scan-chain methodology, tools/probe_device_time.py — per-call wall
    timing through the axon tunnel has a ~2 ms dispatch floor and is
    useless at this granularity):
      forward:  v1 scratch-copy kernel 0.37 ms  (matmul-form v2: 0.85 ms,
                XLA patch-slice: 6.9 ms)  -> v1
      backward: matmul-form v2 2.29 ms  (v1 per-query scatter: 4.56 ms)
                -> v2
    """
    return _corr_lookup_pallas_impl(corr, coords)


def _pl_fwd(corr, coords):
    return _corr_lookup_pallas_impl(corr, coords), (corr, coords)


def _pl_bwd(res, g):
    corr, coords = res
    return _corr_lookup_pallas_v2_bwd_impl(corr, coords, g)


corr_block_lookup_pallas.defvjp(_pl_fwd, _pl_bwd)


# ---------------------------------------------------------------------------
# v3 "padded": lookup over PRE-PADDED x-major levels — zero per-query copies.
#
# The v1 scratch kernel's per-query work is dominated by copying each query's
# full map into a padded VMEM scratch (the copy exists only because (a) the
# dynamic band slice needs real rows at out-of-range x and (b) Mosaic cannot
# dynamically sublane-slice 2-row-packed bf16). Both reasons disappear when
# the maps arrive PRE-PADDED on the x (sublane) axis:
#   - the refinement loop's level einsum emits padded maps for free by
#     zero-padding the x-major source features once per frame (pad rows of
#     f_s are zeros -> pad rows of every query's map are exact zeros; see
#     models/raft.py::_build_levels),
#   - the kernel converts the WHOLE (QB*(w+2*PAD), h) block to an f32
#     scratch in ONE vectorized op (amortizing what v1 paid per query), and
#   - each query is then just a dynamic band slice at rows
#     q*(w+2*PAD) + x0 + PAD - r plus the v1 one-hot y-selection matmul.
# Lane-axis (y) out-of-bounds still folds into the one-hot selection.
# ---------------------------------------------------------------------------


def _corr_lookup_padded_kernel(coords_ref, c0p_ref, c1p_ref, out_ref, s0, s1):
    # one whole-block bf16->f32 convert per level (vectorized; replaces v1's
    # per-query scratch copies, ~70% of its kernel time)
    s0[:, :] = c0p_ref[:, :].astype(jnp.float32)
    s1[:, :] = c1p_ref[:, :].astype(jnp.float32)
    h0 = c0p_ref.shape[1]
    h1 = c1p_ref.shape[1]
    w0p = c0p_ref.shape[0] // QB
    w1p = c1p_ref.shape[0] // QB
    for q in range(QB):  # static unroll over the query block
        cx = coords_ref[q, 0]
        cy = coords_ref[q, 1]
        out_ref[q, 0] = _level_sample_padded(s0, q * w0p, cx, cy, h0)
        out_ref[q, 1] = _level_sample_padded(s1, q * w1p, cx * 0.5, cy * 0.5, h1)


def _level_sample_padded(stack, row0, cx, cy, size):
    """7x7 window from the block-wide f32 scratch of x-PADDED x-major maps.

    stack rows [row0, row0 + size + 2*PAD) hold this query's map: rows
    row0 + PAD + x for real x in [0, size), zeros in the PAD margins. The
    lane (y) axis is unpadded; OOB y taps fold into the one-hot selection.
    Returns (7, 7) with [i, j] = bilinear sample at (x + i - r, y + j - r).
    """
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    x0c = jnp.clip(x0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    y0c = jnp.clip(y0, -(RADIUS + 2), size + RADIUS).astype(jnp.int32)
    sx = row0 + x0c + PAD - RADIUS  # stays inside this query's padded rows
    sy = y0c - RADIUS  # raw y target: OOB columns select nothing
    band = stack[pl.ds(sx, PATCH), :]  # (8, size): rows = x taps
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (size, PATCH), 0)
    sel_ids = sy + jax.lax.broadcasted_iota(jnp.int32, (size, PATCH), 1)
    onehot = (col_ids == sel_ids).astype(band.dtype)  # (size, 8)
    p8t = jax.lax.dot_general(
        band, onehot, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # p8t[i, j] = map[y0c-3+j, x0c-3+i]
    return (
        (1.0 - fx) * (1.0 - fy) * p8t[:WIN, :WIN]
        + fx * (1.0 - fy) * p8t[1:, :WIN]
        + (1.0 - fx) * fy * p8t[:WIN, 1:]
        + fx * fy * p8t[1:, 1:]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_padded_impl(c0p, c1p, coords, interpret=False):
    """Lookup over PRE-PADDED x-major levels (serving/eval production path).

    c0p: (BQ, w + 2*PAD, h) x-major level-0 maps with zero rows in the PAD
    margins; c1p: (BQ, w/2 + 2*PAD, h/2) level-1 maps, same padding. The
    refinement loop emits these directly as einsums against x-PADDED source
    features (models/raft.py), so the padding costs nothing per frame.
    """
    bq, w0p, h = c0p.shape
    w = w0p - 2 * PAD
    assert h == w, "correlation maps must be square (RaftFlow invariant)"
    assert c1p.shape[1] == w // 2 + 2 * PAD and c1p.shape[2] == h // 2
    out_dtype = c0p.dtype
    bq_p, qpad = _pad_queries(bq)
    if qpad:
        c0p = jnp.pad(c0p, ((0, qpad), (0, 0), (0, 0)))
        c1p = jnp.pad(c1p, ((0, qpad), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, qpad), (0, 0)))
    w1p = w // 2 + 2 * PAD
    c0p2 = c0p.reshape(bq_p * w0p, h)
    c1p2 = c1p.reshape(bq_p * w1p, h // 2)
    grid = (bq_p // QB,)
    out = pl.pallas_call(
        _corr_lookup_padded_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB * w0p, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB * w1p, h // 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (QB, 2, WIN, WIN), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq_p, 2, WIN, WIN), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((QB * w0p, h), jnp.float32),
            pltpu.VMEM((QB * w1p, h // 2), jnp.float32),
        ],
        interpret=interpret,
    )(coords, c0p2, c1p2)
    return out[:bq].reshape(bq, 2 * WIN * WIN).astype(out_dtype)


@jax.custom_vjp
def corr_block_lookup_pallas_padded(
    c0p: jnp.ndarray, c1p: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """Fused Pallas lookup over pre-padded x-major levels (2 levels, r=3).

    Args:
      c0p: (BQ, w + 2*PAD, h) x-major level-0 maps, zero rows in the pads.
      c1p: (BQ, w/2 + 2*PAD, h/2) x-major level-1 maps, same padding.
      coords: (BQ, 2) query centers in level-0 pixel coords (xy).

    Returns:
      (BQ, 98), identical to corr_block_lookup on the unpadded maps.

    The backward (rare: this is the eval/serving path) slices the pads off
    and reuses the pret matmul-form scatter, re-padding the cotangents with
    zero rows — exact, since the pad rows are zero-constants upstream.
    """
    return _corr_lookup_pallas_padded_impl(c0p, c1p, coords)


def _padded_fwd(c0p, c1p, coords):
    return _corr_lookup_pallas_padded_impl(c0p, c1p, coords), (c0p, c1p, coords)


def _padded_bwd(res, g):
    c0p, c1p, coords = res
    c0t = c0p[:, PAD:-PAD, :]
    c1t = c1p[:, PAD:-PAD, :]
    d_c0t, d_c1t, dc = _corr_lookup_pallas_pret_bwd_impl(c0t, c1t, coords, g)
    zpad = ((0, 0), (PAD, PAD), (0, 0))
    return jnp.pad(d_c0t, zpad), jnp.pad(d_c1t, zpad), dc


corr_block_lookup_pallas_padded.defvjp(_padded_fwd, _padded_bwd)


# ---------------------------------------------------------------------------
# pret: lookup over PRE-TRANSPOSED levels — the production refinement path.
#
# The refinement loop builds each pyramid level directly as an einsum of
# driving features against x-major (level 0) / pooled-x-major (level 1)
# source features, which is exact (transpose and avg_pool are linear in the
# source features) and removes ALL per-frame XLA-side map prep: no f32 cast,
# no (BQ, h, w) transposes, no volume pooling — the round-3 frame profile
# showed that prep dominating the device's async-copy time.
#
# Forward = the v1 scratch kernel on the maps as given. Backward mirrors the
# v2 matmul-form extract/scatter with the x/y roles swapped (x-major maps:
# rows = x = sublanes, cols = y = lanes), emitting d_c0t / d_c1t directly in
# x-major layout; the upstream einsums' autodiff handles the rest.
# ---------------------------------------------------------------------------


def _prep_targets_pret(c0t32, c1t32, coords):
    """XLA-side prep for the pret backward kernels (x-major maps).

    Mirrors _prep_targets with x/y swapped: feeding _prep_level coordinates
    as (cy, cx) makes its 'row' targets track x (the sublane axis of the
    (BQ*w, h) row stacks) and its 'col' targets track y; its returned
    fractions come back swapped and are swapped back here.

    Returns (c0, c1, tr0, tr1, t0, t1, fx, fy, size, bq_p).
    """
    bq, w, h = c0t32.shape
    assert h == w, "correlation maps must be square (RaftFlow invariant)"
    c0 = c0t32.reshape(bq * w, h)
    c1 = c1t32.reshape(bq * (w // 2), h // 2)
    coords_sw = coords[:, ::-1]
    tr0, tc0, fy0, fx0 = _prep_level(coords_sw, h)
    tr1, tc1, fy1, fx1 = _prep_level(coords_sw * 0.5, h // 2)
    bq_p, qpad = _pad_queries(bq)
    if qpad:
        pad8 = ((0, qpad), (0, 0))
        tr0 = jnp.pad(tr0, pad8, constant_values=-1)
        tr1 = jnp.pad(tr1, pad8, constant_values=-1)
        tc0 = jnp.pad(tc0, pad8, constant_values=-1)
        tc1 = jnp.pad(tc1, pad8, constant_values=-1)
        c0 = jnp.pad(c0, ((0, qpad * w), (0, 0)))
        c1 = jnp.pad(c1, ((0, qpad * (w // 2)), (0, 0)))
    n = QB * PATCH
    tr0 = tr0.reshape(-1, n)  # (n_blocks, QB*8) — padding-free layout
    tr1 = tr1.reshape(-1, n)
    t0 = tc0.reshape(-1, n)
    t1 = tc1.reshape(-1, n)
    fx = jnp.stack([fx0, fx1], axis=-1)
    fy = jnp.stack([fy0, fy1], axis=-1)
    return c0, c1, tr0, tr1, t0, t1, fx, fy, h, bq_p


def _extract_patches_pret(c0t, c1t, coords, interpret=False):
    """Patch extraction from x-major levels (any dtype; converted in-kernel);
    returns (p8, fx, fy) with p8 (BQ, 2, 8, 8) f32 in [x, y] layout
    (sublanes = x taps, lanes = y taps) and fx/fy (BQ, 2) per-level
    bilinear fractions."""
    bq, w, h = c0t.shape
    c0, c1, tr0, tr1, t0, t1, fx, fy, size, bq_p = _prep_targets_pret(
        c0t, c1t, coords
    )
    n = QB * PATCH
    nblk = bq_p // QB
    stacked = pl.pallas_call(
        _patch_extract_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((QB * size, size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB * (size // 2), size // 2), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, PATCH, n), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, PATCH, bq_p * PATCH), jnp.float32),
        interpret=interpret,
    )(tr0, tr1, t0, t1, c0, c1)
    # stacked[l, j_y, q*8+j_x] -> p8[q, l, j_x, j_y]
    p8 = jnp.transpose(
        stacked.reshape(2, PATCH, bq_p, PATCH), (2, 0, 3, 1)
    )[:bq]
    return p8, fx, fy


@functools.partial(jax.jit, static_argnames=("interpret",))
def _corr_lookup_pallas_pret_bwd_impl(c0t, c1t, coords, g, interpret=False):
    """x-major mirror of _corr_lookup_pallas_v2_bwd_impl.

    Returns (d_c0t, d_c1t, d_coords) — per-level cotangent maps in the same
    x-major layout as the inputs (no pool/transpose folding: the upstream
    level einsums differentiate themselves).
    """
    bq, w, h = c0t.shape
    # maps are passed in their own dtype (bf16 under the compute policy) —
    # the extract kernel converts per-block; materializing f32 copies of the
    # (BQ, 64, 64) stacks here cost ~1.9 GB padded at b=10 and OOM'd the
    # reference-scale train step
    # g is x-major (reference channel order c = i*7 + j, i = x) — already
    # the pret kernels' native [x, y] patch layout, no swap
    g = g.astype(jnp.float32).reshape(bq, 2, WIN, WIN)

    p8, fx, fy = _extract_patches_pret(c0t, c1t, coords, interpret)
    fxb = fx[..., None, None]
    fyb = fy[..., None, None]
    # a.e. derivatives of the bilinear blend; p8 is [x, y]: x-differences
    # run along sublanes, y along lanes
    ddx = (1.0 - fyb) * (p8[..., 1:, :WIN] - p8[..., :WIN, :WIN]) + fyb * (
        p8[..., 1:, 1:] - p8[..., :WIN, 1:]
    )
    ddy = (1.0 - fxb) * (p8[..., :WIN, 1:] - p8[..., :WIN, :WIN]) + fxb * (
        p8[..., 1:, 1:] - p8[..., 1:, :WIN]
    )
    dcxl = jnp.sum(g * ddx, axis=(-1, -2))
    dcyl = jnp.sum(g * ddy, axis=(-1, -2))
    dc = jnp.stack(
        [dcxl[:, 0] + 0.5 * dcxl[:, 1], dcyl[:, 0] + 0.5 * dcyl[:, 1]], axis=-1
    )

    # cotangent patches d8[i, j] = sum_ab w_ab g[i-a, j-b] (BQ, 2, 8, 8);
    # the fx term shifts along sublanes (x), the fy term along lanes (y)
    w00 = ((1.0 - fx) * (1.0 - fy))[..., None, None]
    wx = (fx * (1.0 - fy))[..., None, None]
    wy = ((1.0 - fx) * fy)[..., None, None]
    w11 = (fx * fy)[..., None, None]
    d8 = (
        w00 * jnp.pad(g, ((0, 0), (0, 0), (0, 1), (0, 1)))
        + wx * jnp.pad(g, ((0, 0), (0, 0), (1, 0), (0, 1)))
        + wy * jnp.pad(g, ((0, 0), (0, 0), (0, 1), (1, 0)))
        + w11 * jnp.pad(g, ((0, 0), (0, 0), (1, 0), (1, 0)))
    )

    _, _, tr0, tr1, t0, t1, _, _, size, bq_p = _prep_targets_pret(
        c0t, c1t, coords
    )
    # transposed (2, 8, BQ*8) layout — no lane-tail padding (see
    # _patch_scatter_kernel docstring)
    d8s = jnp.transpose(d8, (1, 3, 0, 2)).reshape(2, PATCH, bq * PATCH)
    qpad = bq_p - bq
    if qpad:
        d8s = jnp.pad(d8s, ((0, 0), (0, 0), (0, qpad * PATCH)))
    n = QB * PATCH
    nblk = bq_p // QB
    d0p, d1p = pl.pallas_call(
        _patch_scatter_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, PATCH, n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((QB * size, size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (QB * (size // 2), size // 2), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            # cotangents in the maps' own dtype: at b=10 the f32 outputs
            # (+2x lane padding) alone were 1.5 GB
            jax.ShapeDtypeStruct((bq_p * size, size), c0t.dtype),
            jax.ShapeDtypeStruct((bq_p * (size // 2), size // 2), c1t.dtype),
        ),
        interpret=interpret,
    )(tr0, tr1, t0, t1, d8s)
    d_c0t = d0p.reshape(bq_p, size, size)[:bq]
    d_c1t = d1p.reshape(bq_p, size // 2, size // 2)[:bq]
    return d_c0t, d_c1t, dc.astype(coords.dtype)


@jax.custom_vjp
def corr_block_lookup_pallas_pret(
    c0t: jnp.ndarray, c1t: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """Fused Pallas lookup over pre-transposed levels (2 levels, r=3).

    Args:
      c0t: (BQ, w, h) x-major level-0 correlation maps.
      c1t: (BQ, w/2, h/2) x-major level-1 maps.
      coords: (BQ, 2) query centers in level-0 pixel coords (xy).

    Returns:
      (BQ, 98), identical to corr_block_lookup(c0, coords) on the
      un-transposed maps when c1 = avg_pool(c0) (tests/test_pallas.py).
    """
    return _corr_lookup_pallas_pret_impl(c0t, c1t, coords)


def _pret_fwd(c0t, c1t, coords):
    return _corr_lookup_pallas_pret_impl(c0t, c1t, coords), (c0t, c1t, coords)


def _pret_bwd(res, g):
    c0t, c1t, coords = res
    return _corr_lookup_pallas_pret_bwd_impl(c0t, c1t, coords, g)


corr_block_lookup_pallas_pret.defvjp(_pret_fwd, _pret_bwd)
