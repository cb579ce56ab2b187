"""Thin-plate-spline transforms (L0).

Two distinct TPS flavors exist in the reference and both are preserved:

1. `tps_fit` / `tps_warp_coordinates` — the TPSM prior's exact TPS solve from
   K groups of 5 keypoint pairs (semantics of /root/reference/modules/util.py:
   341-410, mode 'kp'): radial basis U(d²) = d²·log(d² + 1e-9), linear system
   L θ = Y regularized with 0.01·I, solved per (batch, group).

2. `random_transform_*` — the equivariance-loss random affine+TPS warp
   (semantics of /root/reference/modules/model.py:26-77): radial basis uses the
   **L1** distance, U(r) = r²·log(r + 1e-6); jacobian computed by forward-mode
   autodiff (the reference uses torch autograd).

All are pure functions; randomness enters only through explicit PRNG keys.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mrfa_tpu.ops.grid import make_coordinate_grid


class TpsParams(NamedTuple):
    """Fitted TPS transform for K groups: x -> A x + b + Σ w_i U(|x - c_i|²)."""

    theta: jnp.ndarray  # (B, G, 2, 3) affine part
    control_points: jnp.ndarray  # (B, G, N, 2)
    control_params: jnp.ndarray  # (B, G, N, 2)


def tps_fit(kp_1: jnp.ndarray, kp_2: jnp.ndarray) -> TpsParams:
    """Fit per-group TPS mapping kp_1 -> kp_2.

    Args:
      kp_1: (B, G, N, 2) source control points (driving kp in the prior).
      kp_2: (B, G, N, 2) target values.
    """
    b, g, n, _ = kp_1.shape
    d = kp_1[:, :, :, None, :] - kp_1[:, :, None, :, :]  # (B,G,N,N,2)
    k = jnp.sum(d * d, axis=-1)  # squared L2
    k = k * jnp.log(k + 1e-9)

    ones = jnp.ones((b, g, n, 1), dtype=kp_1.dtype)
    p = jnp.concatenate([kp_1, ones], axis=3)  # (B,G,N,3)
    zeros33 = jnp.zeros((b, g, 3, 3), dtype=kp_1.dtype)
    top = jnp.concatenate([k, jnp.swapaxes(p, 2, 3)], axis=2)  # (B,G,N+3,N)
    right = jnp.concatenate([p, zeros33], axis=2)  # (B,G,N+3,3)
    l_mat = jnp.concatenate([top, right], axis=3)  # (B,G,N+3,N+3)
    l_mat = l_mat + 0.01 * jnp.eye(n + 3, dtype=kp_1.dtype)

    y = jnp.concatenate(
        [kp_2, jnp.zeros((b, g, 3, 2), dtype=kp_1.dtype)], axis=2
    )  # (B,G,N+3,2)
    param = jnp.linalg.solve(l_mat, y)  # (B,G,N+3,2)
    theta = jnp.swapaxes(param[:, :, n:, :], 2, 3)  # (B,G,2,3)
    return TpsParams(theta=theta, control_points=kp_1, control_params=param[:, :, :n, :])


def tps_warp_coordinates(params: TpsParams, coords: jnp.ndarray) -> jnp.ndarray:
    """Apply the fitted TPS to coordinates.

    Args:
      coords: (B, M, 2) or (1, M, 2) query coordinates.

    Returns:
      (B, G, M, 2) warped coordinates.
    """
    theta, cps, cpar = params
    b = theta.shape[0]
    coords = jnp.broadcast_to(coords, (b,) + coords.shape[1:])
    # Affine: (B,G,2,2) @ (B,1,2,M) + (B,G,2,1)
    aff = (
        jnp.einsum("bgij,bmj->bgmi", theta[:, :, :, :2], coords)
        + theta[:, :, None, :, 2]
    )
    # Radial: U(|coord - control|²) with U(s) = s log(s + 1e-9)
    d = coords[:, None, None, :, :] - cps[:, :, :, None, :]  # (B,G,N,M,2)
    s = jnp.sum(d * d, axis=-1)
    u = s * jnp.log(s + 1e-9)  # (B,G,N,M)
    rad = jnp.einsum("bgnm,bgnc->bgmc", u, cpar)
    return aff + rad


def tps_transform_grid(params: TpsParams, h: int, w: int) -> jnp.ndarray:
    """Dense warp field for a full (h, w) frame: (B, G, h, w, 2)."""
    grid = make_coordinate_grid(h, w).reshape(1, h * w, 2)
    warped = tps_warp_coordinates(params, grid)
    b, g = warped.shape[:2]
    return warped.reshape(b, g, h, w, 2)


# ---------------------------------------------------------------------------
# Random affine+TPS used by the equivariance loss.
# ---------------------------------------------------------------------------


class RandomTransformParams(NamedTuple):
    theta: jnp.ndarray  # (B, 2, 3)
    control_points: jnp.ndarray | None  # (1, P², 2)
    control_params: jnp.ndarray | None  # (B, 1, P²)


def random_transform_params(
    key: jax.Array,
    bs: int,
    sigma_affine: float,
    sigma_tps: float | None = None,
    points_tps: int | None = None,
    dtype=jnp.float32,
) -> RandomTransformParams:
    """Sample a random affine (+ optional TPS) warp for equivariance."""
    k1, k2 = jax.random.split(key)
    eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=dtype)[None], (bs, 2, 3))
    theta = eye + sigma_affine * jax.random.normal(k1, (bs, 2, 3), dtype=dtype)
    if sigma_tps is not None and points_tps is not None:
        cps = make_coordinate_grid(points_tps, points_tps, dtype=dtype)
        cps = cps.reshape(1, points_tps * points_tps, 2)
        cpar = sigma_tps * jax.random.normal(
            k2, (bs, 1, points_tps * points_tps), dtype=dtype
        )
        return RandomTransformParams(theta=theta, control_points=cps, control_params=cpar)
    return RandomTransformParams(theta=theta, control_points=None, control_params=None)


def random_transform_warp(
    params: RandomTransformParams, coords: jnp.ndarray
) -> jnp.ndarray:
    """Warp coordinates (B or 1, M, 2) -> (B, M, 2).

    Affine part plus an L1-distance TPS bump: U(r) = r² log(r + 1e-6) with
    r = |dx| + |dy| (this is the reference equivariance transform's basis,
    distinct from the prior TPS).
    """
    theta = params.theta
    b = theta.shape[0]
    coords = jnp.broadcast_to(coords, (b,) + coords.shape[1:])
    out = jnp.einsum("bij,bmj->bmi", theta[:, :, :2], coords) + theta[:, None, :, 2]
    if params.control_points is not None:
        d = coords[:, :, None, :] - params.control_points[:, None, :, :]  # (B,M,P,2)
        r = jnp.sum(jnp.abs(d), axis=-1)  # L1 distance
        u = (r * r) * jnp.log(r + 1e-6)  # (B,M,P)
        bump = jnp.einsum("bmp,bp->bm", u, params.control_params[:, 0, :])
        out = out + bump[:, :, None]
    return out


def random_transform_frame(
    params: RandomTransformParams, frame: jnp.ndarray
) -> jnp.ndarray:
    """Warp a frame (B, H, W, C) by the random transform (reflection pad)."""
    from mrfa_tpu.ops.sampler import grid_sample

    b, h, w, _ = frame.shape
    grid = make_coordinate_grid(h, w, dtype=frame.dtype).reshape(1, h * w, 2)
    warped = random_transform_warp(params, grid).reshape(b, h, w, 2)
    return grid_sample(frame, warped, align_corners=False, padding_mode="reflection")


def random_transform_jacobian(
    params: RandomTransformParams, coords: jnp.ndarray
) -> jnp.ndarray:
    """d(warp)/d(coords) at each point: (B, M, 2, 2), exact forward-mode AD."""

    def warp_point(xy, theta, cps, cpar):
        out = theta[:, :2] @ xy + theta[:, 2]
        if cps is not None:
            d = xy[None, :] - cps  # (P, 2)
            r = jnp.sum(jnp.abs(d), axis=-1)
            u = (r * r) * jnp.log(r + 1e-6)
            out = out + jnp.sum(u * cpar)
        return out

    def per_batch(theta, cpar, coords_b):
        cps = params.control_points[0] if params.control_points is not None else None

        def per_point(xy):
            return jax.jacfwd(warp_point)(xy, theta, cps, cpar)

        return jax.vmap(per_point)(coords_b)

    b = params.theta.shape[0]
    coords = jnp.broadcast_to(coords, (b,) + coords.shape[1:])
    cpar = (
        params.control_params[:, 0, :]
        if params.control_params is not None
        else jnp.zeros((b, 0), dtype=coords.dtype)
    )
    return jax.vmap(per_batch)(params.theta, cpar, coords)
