"""Coordinate grids and keypoint-gaussian geometry (L0).

Behavioral parity targets (see /root/reference/modules/util.py:53-108 for the
semantics being matched; implementation here is NHWC/JAX-native):
  - make_coordinate_grid: [-1,1]^2 meshgrid, xy channel order, endpoints hit
    exactly (align_corners=True convention).
  - coords_grid: pixel-space identity grid, xy order.
  - kp2gaussian: keypoints in [-1,1] -> isotropic gaussian heatmaps.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized [-1,1] meshgrid of shape (h, w, 2), xy order.

    x varies along axis 1 (width), y along axis 0 (height); both reach the
    endpoints -1 and 1 exactly (align_corners=True convention).
    """
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-space identity grid of shape (h, w, 2), xy order (x = column)."""
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def kp2gaussian(kp: jnp.ndarray, spatial_size, kp_variance: float) -> jnp.ndarray:
    """Keypoints -> gaussian heatmaps.

    Args:
      kp: (..., K, 2) keypoint coordinates in [-1, 1], xy order.
      spatial_size: (h, w).
      kp_variance: isotropic variance in normalized units.

    Returns:
      (..., h, w, K) heatmaps in NHWC-style channel-last layout.
    """
    h, w = spatial_size
    grid = make_coordinate_grid(h, w, dtype=kp.dtype)  # (h, w, 2)
    # (..., 1, 1, K, 2) vs (h, w, 1, 2)
    mean = kp[..., None, None, :, :]  # (..., 1, 1, K, 2)
    diff = grid[..., :, :, None, :] - mean  # (..., h, w, K, 2)
    out = jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)
    return out  # (..., h, w, K)


def to_homogeneous(coords: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous 1 to the last axis."""
    ones = jnp.ones(coords.shape[:-1] + (1,), dtype=coords.dtype)
    return jnp.concatenate([coords, ones], axis=-1)


def from_homogeneous(coords: jnp.ndarray) -> jnp.ndarray:
    """Divide out the homogeneous coordinate."""
    return coords[..., :2] / coords[..., 2:3]


def np_gaussian_kernel_2d(sigma: float, kernel_size: int) -> np.ndarray:
    """Separable 2-D gaussian kernel (numpy, computed at trace/init time)."""
    ax = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2.0
    k1 = np.exp(-((ax - mean) ** 2) / (2.0 * sigma**2))
    k2 = np.outer(k1, k1)
    k2 = k2 / k2.sum()
    return k2.astype(np.float32)
