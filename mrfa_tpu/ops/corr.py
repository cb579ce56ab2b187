"""Correlation-volume lookup ops for the RAFT-style refinement loop.

The reference looks up a (2r+1)^2 = 49-point bilinear window per query pixel
with a mega-batched grid_sample (/root/reference/modules/raft.py:23-48, with
the `batch_bilinear_sampler` chunk hack to cap memory). Here the lookup is
re-derived for TPU:

Because the window offsets are integers, all 49 samples of a query share one
fractional offset (fx, fy). The lookup therefore equals:
  1. slice one (2r+2)x(2r+2) integer patch around (floor(x), floor(y))
     from the zero-padded correlation map (a contiguous block gather),
  2. blend the four shifted (2r+1)x(2r+1) sub-patches with the scalar
     bilinear weights (pure VPU math).

That replaces ~392 gathered scalars per query with one 64-element contiguous
block — the difference between a gather-bound loop and a bandwidth-friendly
one. Zero-padding by (2r+2) preserves the exact out-of-bounds semantics of
grid_sample's zeros padding (verified against the reference in tests).

The reference's window-channel order quirk (x offset varies along the FIRST
window axis: channel c = i*(2r+1)+j samples (x+i-r, y+j-r)) is preserved so
converted conv weights match.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mrfa_tpu.ops.resize import avg_pool
from mrfa_tpu.ops.sampler import sample_pixel


def corr_window_offsets(radius: int = 3, dtype=jnp.float32) -> jnp.ndarray:
    """(2r+1, 2r+1, 2) window offsets; x varies along the FIRST axis.

    Preserves the reference's channel order: output channel c = i*(2r+1)+j
    corresponds to sampling at (x + i - r, y + j - r).
    """
    d = jnp.arange(-radius, radius + 1, dtype=dtype)
    ox = jnp.broadcast_to(d[:, None], (2 * radius + 1, 2 * radius + 1))
    oy = jnp.broadcast_to(d[None, :], (2 * radius + 1, 2 * radius + 1))
    return jnp.stack([ox, oy], axis=-1)


def corr_block_lookup(
    corr: jnp.ndarray,
    coords: jnp.ndarray,
    num_levels: int = 2,
    radius: int = 3,
) -> jnp.ndarray:
    """Gather-based RAFT correlation pyramid lookup (reference formulation).

    Args:
      corr: (BQ, hs, ws, 1) per-query correlation maps over the source axis.
      coords: (BQ, 2) query center in level-0 source pixel coords (xy).

    Returns:
      (BQ, num_levels*(2r+1)^2) sampled correlation features.

    Used as the autodiff path (its vjp is a plain scatter-add) and as the
    exactness oracle for the patch-slice fast path below.
    """
    offsets = corr_window_offsets(radius, dtype=coords.dtype)  # (7,7,2)
    outs = []
    cur = corr
    for lvl in range(num_levels):
        c = coords / (2.0**lvl)
        window = c[:, None, None, :] + offsets[None]  # (BQ,7,7,2)
        sampled = sample_pixel(cur, window)  # (BQ,7,7,1)
        outs.append(sampled.reshape(coords.shape[0], -1))
        if lvl + 1 < num_levels:
            cur = avg_pool(cur, 2)
    return jnp.concatenate(outs, axis=-1)


def _patch_lookup(corr: jnp.ndarray, coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """One-level window lookup.

    Args:
      corr: (BQ, H, W) per-query correlation maps.
      coords: (BQ, 2) query centers in pixel xy.

    Returns:
      (BQ, (2r+1)^2) sampled window, reference channel order.
    """
    bq, h, w = corr.shape
    r = radius
    pad = 2 * r + 2  # covers clamp margin for fully-out-of-bounds windows
    win = 2 * r + 1
    patch = 2 * r + 2

    cx = coords[:, 0]
    cy = coords[:, 1]
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(corr.dtype)
    fy = (cy - y0).astype(corr.dtype)

    # clamp so the patch stays inside the padded array; outside this range the
    # true window is entirely out of bounds and lands in the zero pad region
    x0c = jnp.clip(x0, -(r + 2), w + r).astype(jnp.int32)
    y0c = jnp.clip(y0, -(r + 2), h + r).astype(jnp.int32)
    sx = x0c + pad - r
    sy = y0c + pad - r

    padded = jnp.pad(corr, ((0, 0), (pad, pad), (pad, pad)))

    def slice_one(p, y, x):
        return jax.lax.dynamic_slice(p, (y, x), (patch, patch))

    p8 = jax.vmap(slice_one)(padded, sy, sx)  # (BQ, 2r+2, 2r+2)

    fx = fx[:, None, None]
    fy = fy[:, None, None]
    q = (
        (1 - fx) * (1 - fy) * p8[:, :win, :win]
        + fx * (1 - fy) * p8[:, :win, 1:]
        + (1 - fx) * fy * p8[:, 1:, :win]
        + fx * fy * p8[:, 1:, 1:]
    )  # (BQ, win_y, win_x): q[j, i] = sample at (x+i-r, y+j-r)... transposed
    # reference channel order: c = i*win + j with x offset on the first axis
    return jnp.swapaxes(q, 1, 2).reshape(bq, win * win)


def _lookup_fast_impl(
    corr: jnp.ndarray,
    coords: jnp.ndarray,
    num_levels: int = 2,
    radius: int = 3,
) -> jnp.ndarray:
    cur = corr[..., 0]  # (BQ, H, W)
    outs = []
    for lvl in range(num_levels):
        outs.append(_patch_lookup(cur, coords / (2.0**lvl), radius))
        if lvl + 1 < num_levels:
            cur = avg_pool(cur[..., None], 2)[..., 0]
    return jnp.concatenate(outs, axis=-1)


def corr_block_lookup_levels_gather(
    c0: jnp.ndarray, c1: jnp.ndarray, coords: jnp.ndarray, radius: int = 3
) -> jnp.ndarray:
    """Gather-oracle lookup over PRECOMPUTED pyramid levels (y-major maps).

    Levels arrive as separate (BQ, h, w) / (BQ, h/2, w/2) maps instead of one
    map pooled internally: the refinement loop builds each level directly as
    an einsum against (pooled) source features — avg_pool over either axis of
    the correlation volume is linear in the features, so pooling f_d/f_s
    first is exact and avoids materializing/pooling the (4096, 4096) volume
    (see models/raft.py). Autodiff-clean (vjp is a plain scatter-add).
    """
    offsets = corr_window_offsets(radius, dtype=coords.dtype)
    outs = []
    for lvl, cur in enumerate((c0, c1)):
        c = coords / (2.0**lvl)
        window = c[:, None, None, :] + offsets[None]
        outs.append(
            sample_pixel(cur[..., None], window).reshape(coords.shape[0], -1)
        )
    return jnp.concatenate(outs, axis=-1)


def _levels_fast_impl(c0, c1, coords, radius: int = 3):
    return jnp.concatenate(
        [_patch_lookup(c0, coords, radius), _patch_lookup(c1, coords * 0.5, radius)],
        axis=-1,
    )


@jax.custom_vjp
def corr_block_lookup_levels(
    c0: jnp.ndarray, c1: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """Patch-slice lookup over precomputed levels (2 levels, r=3), y-major.

    Args:
      c0: (BQ, h, w) level-0 per-query correlation maps.
      c1: (BQ, h/2, w/2) level-1 (2x2-mean-pooled) maps.
      coords: (BQ, 2) query centers in level-0 pixel coords (xy).

    Returns:
      (BQ, 98), identical to corr_block_lookup(c0[..., None], coords) when
      c1 == avg_pool(c0). Custom vjp linearizes the gather formulation
      (plain scatter-add, no padded residuals), like corr_block_lookup_fast.
    """
    return _levels_fast_impl(c0, c1, coords)


def _levels_fwd(c0, c1, coords):
    return _levels_fast_impl(c0, c1, coords), (c0, c1, coords)


def _levels_bwd(res, g):
    c0, c1, coords = res
    _, vjp = jax.vjp(corr_block_lookup_levels_gather, c0, c1, coords)
    return vjp(g)


corr_block_lookup_levels.defvjp(_levels_fwd, _levels_bwd)


@jax.custom_vjp
def corr_block_lookup_fast(corr: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """RAFT correlation pyramid lookup via patch slicing (2 levels, r=3).

    Args:
      corr: (BQ, hs, ws, 1) per-query correlation maps over the source axis.
      coords: (BQ, 2) query centers in level-0 source pixel coords (xy).

    Returns:
      (BQ, 98) features, identical to the gather-based path.

    Custom VJP: the forward slices zero-padded patches (fast, but its naive
    autodiff would hold ~1.6x-padded (BQ, 80, 80) residuals per refinement
    iteration — an HBM blow-up in training); the backward instead linearizes
    the gather formulation, whose vjp is a plain scatter-add into the
    unpadded corr shape. Gradients are exact.
    """
    return _lookup_fast_impl(corr, coords)


def _lookup_fwd(corr, coords):
    return _lookup_fast_impl(corr, coords), (corr, coords)


def _lookup_bwd(res, g):
    corr, coords = res
    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    return vjp(g)


corr_block_lookup_fast.defvjp(_lookup_fwd, _lookup_bwd)
