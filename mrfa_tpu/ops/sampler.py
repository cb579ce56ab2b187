"""Bilinear grid sampling (backward warp) — the L0 op the whole model hangs on.

The reference model uses three distinct grid-sample semantics
(/root/reference/modules/util.py:26-38, dense_motion.py:83, model.py:48):
  (a) pixel-coordinate sampling with align_corners=True, zero padding
      (`bilinear_sampler`) — covered by `sample_pixel`,
  (b) normalized [-1,1] grids with align_corners=False, zero padding
      (torch `F.grid_sample` defaults),
  (c) normalized grids with reflection padding (equivariance transform).

This module implements all three as one gather-based XLA kernel. The gather
runs on the VPU; for the per-pixel 49-point correlation lookup there is a
fused Pallas path in `mrfa_tpu.ops.pallas_kernels`.

All tensors are NHWC. Grids carry xy (x = width/column) in the last axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] -> pixel coordinates along one axis of length `size`."""
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def _reflect(coord: jnp.ndarray, twice_low: float, twice_high: float) -> jnp.ndarray:
    """Reflection-fold a float coordinate into [twice_low/2, twice_high/2]."""
    if twice_low == twice_high:
        return jnp.zeros_like(coord)
    mn = twice_low * 0.5
    span = (twice_high - twice_low) * 0.5
    c = jnp.abs(coord - mn)
    extra = jnp.mod(c, span)
    flips = jnp.floor(c / span)
    out = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + mn, span - extra + mn)
    return out


def _patch_gather(imgp: jnp.ndarray, y0p, x0p, sy: int, sx: int):
    """Gather (sy, sx, C) slices of a padded (B, Hp, Wp, C) image at the
    per-sample integer starts (B, N) -> (B, N, sy, sx, C).

    ONE gather descriptor per sample instead of one per bilinear tap: on
    TPU, XLA gathers are descriptor-rate-bound at these shapes, so a 2x2xC
    patch gather beats four row gathers ~3x (tools/probe_warp_variants.py).
    Starts must be pre-clamped into the padded range (PROMISE_IN_BOUNDS).
    """
    c = imgp.shape[-1]
    starts = jnp.stack([y0p, x0p], axis=-1)  # (B, N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def g1(op, st):
        return jax.lax.gather(
            op, st, dnums, slice_sizes=(sy, sx, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    return jax.vmap(g1)(imgp, starts)


def _bilinear_core(
    img: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    zero_oob: bool,
) -> jnp.ndarray:
    """Bilinear sample at float pixel coords ix, iy of shape (B, N).

    If zero_oob, out-of-bounds corner pixels contribute zero (torch
    padding_mode='zeros'); otherwise indices are clamped (the coords are
    assumed pre-folded for border/reflection modes, where out-of-range taps
    only ever occur with exactly-zero weight).

    Implementation: a single 2x2xC patch gather per sample from a
    zero-padded copy, with the four taps blended from the patch. For
    small channel counts (c*2 <= 128, even W) pairs of x-columns are first
    merged into the channel axis (a free view) so the gather rows fill the
    128-lane registers; the true taps are then parity-selected from the
    4-pixel window.
    """
    b, h, w, c = img.shape
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f
    wy = iy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    w00 = (1.0 - wx) * (1.0 - wy)
    w10 = wx * (1.0 - wy)
    w01 = (1.0 - wx) * wy
    w11 = wx * wy
    if zero_oob:
        vx0 = ((x0 >= 0) & (x0 < w)).astype(wx.dtype)
        vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(wx.dtype)
        vy0 = ((y0 >= 0) & (y0 < h)).astype(wx.dtype)
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(wx.dtype)
        w00 = w00 * vx0 * vy0
        w10 = w10 * vx1 * vy0
        w01 = w01 * vx0 * vy1
        w11 = w11 * vx1 * vy1
    w00 = w00[..., None]
    w10 = w10[..., None]
    w01 = w01[..., None]
    w11 = w11[..., None]

    if c > 128:
        # wide-channel maps (deep pyramid levels, small N): the padded-copy
        # overhead of the patch path exceeds the descriptor savings — four
        # row gathers from the unpadded image win there
        out = None
        for xi, yi, wgt in (
            (x0, y0, w00), (x0 + 1, y0, w10),
            (x0, y0 + 1, w01), (x0 + 1, y0 + 1, w11),
        ):
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            flat = img.reshape(b, h * w, c)
            lin = yc * w + xc
            v = jnp.take_along_axis(flat, lin[:, :, None], axis=1) * wgt
            out = v if out is None else out + v
        return out.astype(img.dtype)

    y0p = jnp.clip(y0, -1, h) + 1  # rows padded (1, 2)
    x0p = jnp.clip(x0, -1, w) + 1
    if 4 * c <= 256:
        # ONE flat row gather per sample from a pre-expanded patch image:
        # img4[y, x] holds the full 2x2xC patch at (y-1, x-1) contiguously
        # (4 shifted copies concatenated channel-wise). TPU gathers cost a
        # fixed ~13 ns per DESCRIPTOR (tools/probe_warp_variants.py; rate is
        # N-proportional and locality-independent), so one 4C-row descriptor
        # beats the 2-row (2,2,C) slice gather ~2x — and the single linear
        # start index avoids the (B,N,2) start-tensor relayout copies the
        # old path paid per warp. The expansion is a cheap shift-concat
        # fusion; for per-clip-constant sources XLA CSEs it across warps.
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        img4 = jnp.concatenate(
            [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
             imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1,
        )  # (B, h+2, w+2, 4C)
        flat = img4.reshape(b, (h + 2) * (w + 2), 4 * c)
        lin = y0p * (w + 2) + x0p
        v = jnp.take_along_axis(
            flat, lin[:, :, None], axis=1, mode="promise_in_bounds"
        )  # (B, N, 4C)
        p00 = v[..., :c]
        p10 = v[..., c:2 * c]
        p01 = v[..., 2 * c:3 * c]
        p11 = v[..., 3 * c:]
    else:
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        patch = _patch_gather(imgp, y0p, x0p, 2, 2)  # (B, N, 2, 2, C)
        p00, p10 = patch[:, :, 0, 0], patch[:, :, 0, 1]
        p01, p11 = patch[:, :, 1, 0], patch[:, :, 1, 1]

    # blend accumulates in f32 (the fraction weights stay f32 — bf16
    # fractions would quantize smooth warps to 1/256-pixel steps); only the
    # RESULT drops to the image dtype. Under the bf16 compute policy this
    # halves every warp output the per-iteration remat has to hold (the f32
    # saves were ~3 GB of the b=10 train step's OOM).
    out = p00 * w00 + p10 * w10 + p01 * w01 + p11 * w11  # (B, N, C)
    return out.astype(img.dtype)


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear backward warp with torch `F.grid_sample` semantics, NHWC.

    Args:
      img: (B, H, W, C).
      grid: (B, *S, 2) normalized xy coordinates in [-1, 1].
      align_corners: coordinate convention flag.
      padding_mode: 'zeros' | 'border' | 'reflection'.

    Returns:
      (B, *S, C) sampled values.
    """
    b, h, w, c = img.shape
    sdims = grid.shape[1:-1]
    g = grid.reshape(b, -1, 2)
    ix = _unnormalize(g[..., 0], w, align_corners)
    iy = _unnormalize(g[..., 1], h, align_corners)

    if padding_mode == "zeros":
        out = _bilinear_core(img, ix, iy, zero_oob=True)
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
        out = _bilinear_core(img, ix, iy, zero_oob=False)
    elif padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, 2.0 * (w - 1))
            iy = _reflect(iy, 0.0, 2.0 * (h - 1))
        else:
            ix = _reflect(ix, -1.0, 2.0 * w - 1.0)
            iy = _reflect(iy, -1.0, 2.0 * h - 1.0)
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
        out = _bilinear_core(img, ix, iy, zero_oob=False)
    else:
        raise ValueError(f"unknown padding_mode {padding_mode!r}")

    return out.reshape((b,) + sdims + (c,))


def sample_pixel(img: jnp.ndarray, coords: jnp.ndarray, mask: bool = False):
    """Bilinear sample at raw pixel xy coordinates, zero padding.

    Matches the reference `bilinear_sampler` (pixel coords normalized then
    sampled with align_corners=True — algebraically the identity mapping, so
    we sample the pixel coordinates directly).

    Args:
      img: (B, H, W, C).
      coords: (B, *S, 2) pixel-space xy coordinates.
      mask: also return an in-bounds float mask (strict interior, matching
        the reference's `(x > -1) & (x < 1)` on normalized coords).

    Returns:
      (B, *S, C), and optionally (B, *S, 1) mask.
    """
    b, h, w, c = img.shape
    sdims = coords.shape[1:-1]
    cc = coords.reshape(b, -1, 2)
    out = _bilinear_core(img, cc[..., 0], cc[..., 1], zero_oob=True)
    out = out.reshape((b,) + sdims + (c,))
    if mask:
        xg = 2.0 * cc[..., 0] / (w - 1) - 1.0
        yg = 2.0 * cc[..., 1] / (h - 1) - 1.0
        m = (xg > -1) & (xg < 1) & (yg > -1) & (yg < 1)
        m = m.astype(img.dtype).reshape((b,) + sdims + (1,))
        return out, m
    return out
