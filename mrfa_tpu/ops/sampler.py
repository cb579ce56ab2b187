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

import functools
import os

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Custom warp differentiation (no XLA scatter).
#
# The forward gathers are descriptor-rate-optimal, but their AUTODIFF
# backward is lax.scatter-add, which XLA:TPU lowers to a serialized
# per-sample while loop (~4 us/sample — the round-4 train profile showed
# these loops eating ~2 s of a 3 s b=10 train step). `_bilinear_core`
# therefore carries a custom_vjp:
#
#   d_img[b,y,x,c] = sum_n WY[b,n,y] * WX[b,n,x] * g[b,n,c]
#
# where WY/WX are the bilinearly-weighted one-hot PAIRS per axis (the
# separable factorization of the 2x2 splat, validity masks folded in),
# evaluated as (U = WX outer g, then WY^T @ U) on the MXU, n-chunked so the
# (B, chunk, W, C) intermediate stays bounded. d_coords is analytic from
# regathered taps (the taps are constants a.e.; only the fraction weights
# carry coordinate derivatives — exactly what autodiff computes).
# ---------------------------------------------------------------------------

_SPLAT_CHUNK_BYTES = 128 * 1024 * 1024  # bound on the (B, cs, W, C) temp

# Pallas splat dispatch: the XLA chunked matmul splat below is
# bandwidth-bound (it round-trips the (B,H,W*C) f32 accumulator and the
# (B,chunk,W,C) outer product through HBM every chunk — ~160 ms per
# full-res warp backward at the b=10 256px train step). The Pallas kernel
# (ops/pallas_splat.py) keeps the output tile in VMEM across all chunks.
# Dispatch from 2048 queries on TPU; below that (or for non-lane-aligned
# C like RGB) the XLA form stays.
_SPLAT_PALLAS_MIN_N = 2048


def train_gather_mode():
    """Gather mode for the full-res feature warps under training remat.

    "patch" ((2,2,C) slice gather: one descriptor per sample, only a
    ~1.02x padded copy live in the replay) is the measured default; True
    (four row gathers, zero extra copies) is the minimal-memory fallback,
    selectable via MRFA_TRAIN_GATHER=lean. See `_gather_taps`.
    """
    mode = os.environ.get("MRFA_TRAIN_GATHER", "patch")
    return True if mode == "lean" else mode


def _splat_on_tpu() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def _splat_dispatch(g, y0, wy0, wy1, x0, wx0, wx1, h, w):
    from mrfa_tpu.ops.pallas_splat import pick_tile, splat_pallas

    b, n, c = g.shape
    if (
        n >= _SPLAT_PALLAS_MIN_N
        and pick_tile(w, c) is not None
        and h % 8 == 0
        and _splat_on_tpu()
    ):
        return splat_pallas(g, y0, wy0, wy1, x0, wx0, wx1, h, w)
    return _splat(g, y0, wy0, wy1, x0, wx0, wx1, h, w)


def _splat(g, y0, wy0, wy1, x0, wx0, wx1, h, w):
    """d_img[b,y,x,c] = sum_n WY[b,n,y] * WX[b,n,x] * g[b,n,c] -> (B,h,w,C).

    WY/WX are the weighted one-hot-pair rows (`_pair_mat`) of the separable
    2x2 splat. They are built PER CHUNK inside the accumulation loop — the
    full (B, N, H)+(B, N, W) matrices would be ~670 MB live at the b=10
    train step's full-res warps, which is exactly the memory the matmul
    form is supposed to save. f32 inputs ride the MXU as bf16 triples by
    default — force the exact path there; bf16 inputs are exact under the
    default. Accumulation is f32 either way.
    """
    b, n, c = g.shape
    dt = g.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    itemsize = jnp.dtype(dt).itemsize
    cs = min(n, max(256, _SPLAT_CHUNK_BYTES // max(1, b * w * c * itemsize)))
    steps = -(-n // cs)
    if steps * cs != n:
        pad = steps * cs - n
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        y0 = jnp.pad(y0, ((0, 0), (0, pad)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad)))
        # zero pair weights: padded rows contribute nothing
        wy0, wy1, wx0, wx1 = (
            jnp.pad(a, ((0, 0), (0, pad))) for a in (wy0, wy1, wx0, wx1)
        )

    def body(k, d):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k * cs, cs, 1)  # noqa: E731
        my = _pair_mat(sl(y0), sl(wy0), sl(wy1), h, dt)  # (B, cs, H)
        mx = _pair_mat(sl(x0), sl(wx0), sl(wx1), w, dt)  # (B, cs, W)
        u = mx[:, :, :, None] * sl(g)[:, :, None, :]  # (B, cs, W, C)
        return d + jnp.einsum(
            "bnh,bnm->bhm", my, u.reshape(b, cs, w * c),
            preferred_element_type=jnp.float32, precision=prec,
        )

    d = jnp.zeros((b, h, w * c), jnp.float32)
    if steps > 4:
        d = jax.lax.fori_loop(0, steps, body, d)
    else:
        for k in range(steps):
            d = body(k, d)
    return d.reshape(b, h, w, c)


def _pair_mat(i0, w0, w1, size, dtype):
    """Weighted one-hot pair rows: w0 at index i0, w1 at i0 + 1, (B, N, size).

    Out-of-range indices are clipped to sentinels that match no column, so
    OOB taps drop — their weights are zero under every padding mode anyway.
    """
    i0c = jnp.clip(i0, -1, size)
    ar = jnp.arange(size, dtype=i0.dtype)
    oh0 = (i0c[..., None] == ar).astype(dtype)
    oh1 = (jnp.clip(i0c + 1, -1, size)[..., None] == ar).astype(dtype)
    return oh0 * w0[..., None].astype(dtype) + oh1 * w1[..., None].astype(dtype)


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


def _tap_weights(ix, iy, h, w, zero_oob):
    """Corner indices, fraction weights, and validity-masked blend weights."""
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f
    wy = iy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    if zero_oob:
        vx0 = ((x0 >= 0) & (x0 < w)).astype(wx.dtype)
        vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(wx.dtype)
        vy0 = ((y0 >= 0) & (y0 < h)).astype(wx.dtype)
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(wx.dtype)
    else:
        one = jnp.ones_like(wx)
        vx0 = vx1 = vy0 = vy1 = one
    return x0, y0, wx, wy, vx0, vx1, vy0, vy1


def _gather_taps(img, x0, y0, lean=False):
    """The four corner taps at integer (x0, y0): p00, p10, p01, p11, each
    (B, N, C) — p10 is the x+1 tap. Out-of-range taps read zero (from the
    padded copy) except on the wide-channel/lean path, which clamps (its
    callers zero OOB taps via the weight masks).

    Branching by channel width (tools/probe_warp_variants.py):
      - 4C <= 256: ONE flat row gather per sample from a pre-expanded patch
        image img4[y, x] = the full 2x2xC patch at (y-1, x-1) contiguously
        (4 shifted copies concatenated channel-wise). TPU gathers cost a
        fixed ~13 ns per DESCRIPTOR, so one 4C-row descriptor beats the
        2-row (2,2,C) slice gather ~2x — and the single linear start index
        avoids the (B,N,2) start-tensor relayout copies. The expansion is a
        cheap shift-concat fusion; for per-clip-constant sources XLA CSEs
        it across warps.
      - C <= 128: one (2, 2, C) slice-gather descriptor per sample.
      - C > 128 (deep pyramid levels, small N): the padded-copy overhead
        exceeds the descriptor savings — four row gathers, clamped indices.
      - lean=True forces the four-row-gather path regardless of C: no
        padded copy and no 4x img4 expansion — the minimal-memory option
        for training remat (the img4 expansion is a 4xC live temp inside
        the backward replay; it OOM'd the reference-scale b=10 step).
      - lean="patch" forces the (2, 2, C) slice-gather path regardless of
        C: ONE descriptor per sample like img4, but the only extra live
        temp is the ~1.02x padded copy. The middle ground for training
        remat — the round-5 b=10 profile showed the lean path's 4x gather
        descriptors dominating the step's async-DMA time.
      - lean="img4" forces the pre-expanded flat-row path regardless of C:
        used by the fused context+image final warp (models/raft.py), whose
        concatenated 67 channels sit just over the 4C<=256 default gate —
        measured 9.0 ns/descriptor at 4C=268 (tools/probe_fused_warp.py),
        still the fastest form for that shape.
    """
    b, h, w, c = img.shape
    if lean is True or (not lean and c > 128):
        flat = img.reshape(b, h * w, c)
        taps = []
        for xi, yi in (
            (x0, y0), (x0 + 1, y0), (x0, y0 + 1), (x0 + 1, y0 + 1),
        ):
            lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            taps.append(
                jnp.take_along_axis(
                    flat, lin[:, :, None], axis=1, mode="promise_in_bounds"
                )
            )
        return taps

    y0p = jnp.clip(y0, -1, h) + 1  # rows padded (1, 2)
    x0p = jnp.clip(x0, -1, w) + 1
    imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
    if lean == "img4" or (not lean and 4 * c <= 256):
        img4 = jnp.concatenate(
            [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
             imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1,
        )  # (B, h+2, w+2, 4C)
        flat = img4.reshape(b, (h + 2) * (w + 2), 4 * c)
        lin = y0p * (w + 2) + x0p
        v = jnp.take_along_axis(
            flat, lin[:, :, None], axis=1, mode="promise_in_bounds"
        )  # (B, N, 4C)
        return [v[..., :c], v[..., c:2 * c], v[..., 2 * c:3 * c], v[..., 3 * c:]]

    patch = _patch_gather(imgp, y0p, x0p, 2, 2)  # (B, N, 2, 2, C)
    return [patch[:, :, 0, 0], patch[:, :, 0, 1],
            patch[:, :, 1, 0], patch[:, :, 1, 1]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bilinear_core(
    img: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    zero_oob: bool,
    lean: bool = False,
) -> jnp.ndarray:
    """Bilinear sample at float pixel coords ix, iy of shape (B, N).

    If zero_oob, out-of-bounds corner pixels contribute zero (torch
    padding_mode='zeros'); otherwise indices are clamped (the coords are
    assumed pre-folded for border/reflection modes, where out-of-range taps
    only ever occur with exactly-zero weight).

    Forward: descriptor-optimal tap gathers (`_gather_taps`) + f32 blend.
    Backward (custom): matmul-form weighted splat for d_img and analytic
    d_coords — see the module-level note; autodiff's scatter-add lowers to
    a serialized per-sample while loop on TPU.
    """
    b, h, w, c = img.shape
    x0, y0, wx, wy, vx0, vx1, vy0, vy1 = _tap_weights(ix, iy, h, w, zero_oob)
    w00 = (((1.0 - wx) * (1.0 - wy)) * (vx0 * vy0))[..., None]
    w10 = ((wx * (1.0 - wy)) * (vx1 * vy0))[..., None]
    w01 = (((1.0 - wx) * wy) * (vx0 * vy1))[..., None]
    w11 = ((wx * wy) * (vx1 * vy1))[..., None]
    p00, p10, p01, p11 = _gather_taps(img, x0, y0, lean)

    # blend accumulates in f32 (the fraction weights stay f32 — bf16
    # fractions would quantize smooth warps to 1/256-pixel steps); only the
    # RESULT drops to the image dtype. Under the bf16 compute policy this
    # halves every warp output the per-iteration remat has to hold (the f32
    # saves were ~3 GB of the b=10 train step's OOM).
    out = p00 * w00 + p10 * w10 + p01 * w01 + p11 * w11  # (B, N, C)
    return out.astype(img.dtype)


def _bilinear_core_fwd(img, ix, iy, zero_oob, lean):
    return _bilinear_core(img, ix, iy, zero_oob, lean), (img, ix, iy)


def _bilinear_core_bwd(zero_oob, lean, res, g):
    img, ix, iy = res
    b, h, w, c = img.shape
    x0, y0, wx, wy, vx0, vx1, vy0, vy1 = _tap_weights(ix, iy, h, w, zero_oob)

    # d_img: separable weighted one-hot splat (MXU matmuls, no scatter);
    # large dense warps take the VMEM-resident Pallas kernel
    d_img = _splat_dispatch(
        g, y0, (1.0 - wy) * vy0, wy * vy1, x0, (1.0 - wx) * vx0, wx * vx1,
        h, w,
    ).astype(img.dtype)

    # d_coords: taps are constants a.e. — only the fraction weights carry
    # derivatives. Regather (descriptor-cheap) instead of saving residuals;
    # same lean flag as the forward so the replayed forward's gather
    # structure CSEs with this one instead of doubling the live temps.
    p00, p10, p01, p11 = _gather_taps(img, x0, y0, lean)
    g32 = g.astype(jnp.float32)
    dot = lambda p: jnp.sum(g32 * p.astype(jnp.float32), axis=-1)  # noqa: E731
    t00 = dot(p00) * vx0 * vy0
    t10 = dot(p10) * vx1 * vy0
    t01 = dot(p01) * vx0 * vy1
    t11 = dot(p11) * vx1 * vy1
    d_ix = ((1.0 - wy) * (t10 - t00) + wy * (t11 - t01)).astype(ix.dtype)
    d_iy = ((1.0 - wx) * (t01 - t00) + wx * (t11 - t10)).astype(iy.dtype)
    return d_img, d_ix, d_iy


_bilinear_core.defvjp(_bilinear_core_fwd, _bilinear_core_bwd)


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    lean: bool = False,
) -> jnp.ndarray:
    """Bilinear backward warp with torch `F.grid_sample` semantics, NHWC.

    Args:
      img: (B, H, W, C).
      grid: (B, *S, 2) normalized xy coordinates in [-1, 1].
      align_corners: coordinate convention flag.
      padding_mode: 'zeros' | 'border' | 'reflection'.
      lean: memory-light gather path (see `_gather_taps`) — set under
        training remat where the expanded patch image dominates peak HBM.

    Returns:
      (B, *S, C) sampled values.
    """
    b, h, w, c = img.shape
    sdims = grid.shape[1:-1]
    g = grid.reshape(b, -1, 2)
    ix = _unnormalize(g[..., 0], w, align_corners)
    iy = _unnormalize(g[..., 1], h, align_corners)

    if padding_mode == "zeros":
        out = _bilinear_core(img, ix, iy, True, lean)
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
        out = _bilinear_core(img, ix, iy, False, lean)
    elif padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, 2.0 * (w - 1))
            iy = _reflect(iy, 0.0, 2.0 * (h - 1))
        else:
            ix = _reflect(ix, -1.0, 2.0 * w - 1.0)
            iy = _reflect(iy, -1.0, 2.0 * h - 1.0)
        ix = jnp.clip(ix, 0.0, w - 1.0)
        iy = jnp.clip(iy, 0.0, h - 1.0)
        out = _bilinear_core(img, ix, iy, False, lean)
    else:
        raise ValueError(f"unknown padding_mode {padding_mode!r}")

    return out.reshape((b,) + sdims + (c,))


def sample_pixel(img: jnp.ndarray, coords: jnp.ndarray, mask: bool = False,
                 lean: bool = False):
    """Bilinear sample at raw pixel xy coordinates, zero padding.

    Matches the reference `bilinear_sampler` (pixel coords normalized then
    sampled with align_corners=True — algebraically the identity mapping, so
    we sample the pixel coordinates directly).

    Args:
      img: (B, H, W, C).
      coords: (B, *S, 2) pixel-space xy coordinates.
      mask: also return an in-bounds float mask (strict interior, matching
        the reference's `(x > -1) & (x < 1)` on normalized coords).
      lean: memory-light gather path (see `_gather_taps`).

    Returns:
      (B, *S, C), and optionally (B, *S, 1) mask.
    """
    b, h, w, c = img.shape
    sdims = coords.shape[1:-1]
    cc = coords.reshape(b, -1, 2)
    out = _bilinear_core(img, cc[..., 0], cc[..., 1], True, lean)
    out = out.reshape((b,) + sdims + (c,))
    if mask:
        xg = 2.0 * cc[..., 0] / (w - 1) - 1.0
        yg = 2.0 * cc[..., 1] / (h - 1) - 1.0
        m = (xg > -1) & (xg < 1) & (yg > -1) & (yg < 1)
        m = m.astype(img.dtype).reshape((b,) + sdims + (1,))
        return out, m
    return out
