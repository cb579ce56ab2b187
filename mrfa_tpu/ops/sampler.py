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


def _gather_2d(img: jnp.ndarray, xi: jnp.ndarray, yi: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, yi, xi, :] for index arrays of shape (B, N)."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    lin = yi * w + xi  # (B, N)
    return jnp.take_along_axis(flat, lin[:, :, None], axis=1)  # (B, N, C)


def _bilinear_core(
    img: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    zero_oob: bool,
) -> jnp.ndarray:
    """Bilinear sample at float pixel coords ix, iy of shape (B, N).

    If zero_oob, out-of-bounds corner pixels contribute zero (torch
    padding_mode='zeros'); otherwise indices are clamped (the coords are
    assumed pre-folded for border/reflection modes).
    """
    b, h, w, c = img.shape
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f
    wy = iy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    out = None
    for xi, yi, wgt in (
        (x0, y0, (1.0 - wx) * (1.0 - wy)),
        (x1, y0, wx * (1.0 - wy)),
        (x0, y1, (1.0 - wx) * wy),
        (x1, y1, wx * wy),
    ):
        if zero_oob:
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = wgt * valid.astype(img.dtype)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        v = _gather_2d(img, xc, yc) * wgt[:, :, None]
        out = v if out is None else out + v
    return out  # (B, N, C)


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
