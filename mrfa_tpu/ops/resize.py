"""Resize / pooling ops with torch-parity index math, expressed TPU-first.

Bilinear resize is implemented as two small dense matmuls (one per axis) —
interpolation matrices are built once at trace time (static shapes), so the
resample rides the MXU instead of a gather. Nearest up/down are pure
repeat/slice. Anti-aliased downsampling (gaussian blur + nearest subsample,
matching /root/reference/modules/util.py:282-326 behavior) uses a depthwise
convolution.

All tensors NHWC.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mrfa_tpu.ops.grid import np_gaussian_kernel_2d


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) bilinear interpolation matrix, torch index conventions."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for d in range(out_size):
        if align_corners:
            src = d * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = max(0.0, (d + 0.5) * in_size / out_size - 0.5)
        x0 = min(int(np.floor(src)), in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        lam = src - x0
        m[d, x0] += 1.0 - lam
        m[d, x1] += lam
    return m


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) to (B, h, w, C) via per-axis matmuls."""
    if isinstance(size, int):
        size = (size, size)
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    dt = x.dtype
    if oh != h:
        mh = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=dt)
        x = jnp.einsum("oh,bhwc->bowc", mh, x)
    if ow != w:
        mw = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=dt)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample by an integer factor (torch scale_factor=f)."""
    x = jnp.repeat(x, factor, axis=1)
    x = jnp.repeat(x, factor, axis=2)
    return x


def downsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor downsample by integer factor (src = dst * factor)."""
    return x[:, ::factor, ::factor, :]


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Average pool with kernel=stride=k (sizes must divide; reshape+mean)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    return x.mean(axis=(2, 4))


def gaussian_blur_kernel(sigma: float) -> np.ndarray:
    """Gaussian kernel with the reference's size rule 2*round(4*sigma)+1."""
    ksize = 2 * round(sigma * 4) + 1
    return np_gaussian_kernel_2d(sigma, ksize)


@dataclass(frozen=True)
class AntiAliasParams:
    """Static parameters of band-limited downsampling for a given scale."""

    scale: float
    factor: int
    kernel: np.ndarray | None  # (kh, kw) or None for identity

    @staticmethod
    def create(scale: float) -> "AntiAliasParams":
        if scale == 1.0:
            return AntiAliasParams(scale=1.0, factor=1, kernel=None)
        sigma = (1.0 / scale - 1.0) / 2.0
        kernel = gaussian_blur_kernel(sigma)
        factor = int(round(1.0 / scale))
        return AntiAliasParams(scale=scale, factor=factor, kernel=kernel)


@functools.lru_cache(maxsize=None)
def _blur_matrix(size: int, sigma: float) -> np.ndarray:
    """(size, size) band matrix of the zero-padded 1-D gaussian blur.

    The reference's 2-D kernel (util.py:282-326 there) is the outer product
    of this 1-D gaussian with itself (its joint normalization factors into
    the per-axis sums), so blurring as two per-axis band matmuls is exact.
    """
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    i = np.arange(ksize, dtype=np.float64)
    mean = (ksize - 1) / 2.0
    k1 = np.exp(-((i - mean) ** 2) / (2.0 * sigma**2))
    k1 /= k1.sum()
    m = np.zeros((size, size), dtype=np.float32)
    for o in range(size):
        lo = max(0, o - ka)
        hi = min(size, o + ka + 1)
        m[o, lo:hi] = k1[lo - o + ka : hi - o + ka]
    return m


def antialias_downsample(x: jnp.ndarray, params: AntiAliasParams) -> jnp.ndarray:
    """Gaussian blur then nearest subsample, as two per-axis band matmuls.

    A depthwise conv on a 3-channel image maps terribly onto the MXU
    (profiled at 1.8 ms for a 256px blur on v5e); the band-matrix form is
    the same math as resize_bilinear's matmul resizes and runs in ~0.1 ms.
    """
    if params.kernel is None:
        return x
    b, h, w, c = x.shape
    sigma = (1.0 / params.scale - 1.0) / 2.0
    dt = x.dtype
    mh = jnp.asarray(_blur_matrix(h, sigma), dtype=dt)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    if w == h:
        mw = mh
    else:
        mw = jnp.asarray(_blur_matrix(w, sigma), dtype=dt)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y)
    return downsample_nearest(y, params.factor)
