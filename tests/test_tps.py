"""TPS parity tests vs the reference implementation (torch CPU goldens)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from mrfa_tpu import ops
from tests.reference_loader import load_reference

load_reference()
from modules.util import TPS as RefTPS  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestKpTps:
    def test_fit_and_warp_matches_reference(self):
        bs, g, n = 2, 4, 5
        kp1 = np.tanh(_rand(bs, g, n, 2, seed=11))
        kp2 = np.tanh(_rand(bs, g, n, 2, seed=12))
        ref = RefTPS(
            mode="kp", bs=bs, kp_1=torch.tensor(kp1), kp_2=torch.tensor(kp2)
        )
        coords = _rand(1, 33, 2, seed=13)
        ref_out = ref.warp_coordinates(torch.tensor(coords)).numpy()

        params = ops.tps_fit(jnp.asarray(kp1), jnp.asarray(kp2))
        got = np.asarray(ops.tps_warp_coordinates(params, jnp.asarray(coords)))
        # f32 solve-vs-inverse on the ill-conditioned 8x8 TPS system leaves
        # ~5e-3 absolute differences; behavioral parity, not a bug.
        np.testing.assert_allclose(got, ref_out, atol=2e-2)

    def test_transform_grid_matches_reference(self):
        bs, g, n = 1, 3, 5
        kp1 = np.tanh(_rand(bs, g, n, 2, seed=14))
        kp2 = np.tanh(_rand(bs, g, n, 2, seed=15))
        ref = RefTPS(mode="kp", bs=bs, kp_1=torch.tensor(kp1), kp_2=torch.tensor(kp2))
        frame = torch.zeros(bs, 3, 12, 10)
        ref_grid = ref.transform_frame(frame).numpy()  # (B,G,H,W,2)

        params = ops.tps_fit(jnp.asarray(kp1), jnp.asarray(kp2))
        got = np.asarray(ops.tps_transform_grid(params, 12, 10))
        np.testing.assert_allclose(got, ref_grid, atol=2e-2)


class TestRandomTransform:
    def test_warp_matches_formula(self):
        """Check against an independently coded torch replica of the math."""
        bs, p = 2, 5
        key = jax.random.PRNGKey(42)
        params = ops.random_transform_params(key, bs, 0.05, 0.005, p)
        coords = _rand(1, 17, 2, seed=16)

        theta = torch.tensor(np.asarray(params.theta))
        cps = torch.tensor(np.asarray(params.control_points))
        cpar = torch.tensor(np.asarray(params.control_params))
        tc = torch.tensor(coords)
        theta_u = theta.unsqueeze(1)
        transformed = (
            torch.matmul(theta_u[:, :, :, :2], tc.unsqueeze(-1)) + theta_u[:, :, :, 2:]
        ).squeeze(-1)
        distances = tc.view(tc.shape[0], -1, 1, 2) - cps.view(1, 1, -1, 2)
        distances = torch.abs(distances).sum(-1)
        result = distances**2
        result = result * torch.log(distances + 1e-6)
        result = result * cpar
        result = result.sum(dim=2).view(bs, tc.shape[1], 1)
        ref = (transformed + result).numpy()

        got = np.asarray(ops.random_transform_warp(params, jnp.asarray(coords)))
        np.testing.assert_allclose(got, ref, atol=5e-5)

    def test_jacobian_matches_autograd(self):
        bs = 2
        key = jax.random.PRNGKey(7)
        params = ops.random_transform_params(key, bs, 0.05, 0.005, 5)
        coords_np = np.tanh(_rand(bs, 9, 2, seed=17))

        # torch autograd golden, replicating the reference jacobian() method
        theta = torch.tensor(np.asarray(params.theta))
        cps = torch.tensor(np.asarray(params.control_points))
        cpar = torch.tensor(np.asarray(params.control_params))
        tc = torch.tensor(coords_np, requires_grad=True)

        theta_u = theta.unsqueeze(1)
        transformed = (
            torch.matmul(theta_u[:, :, :, :2], tc.unsqueeze(-1)) + theta_u[:, :, :, 2:]
        ).squeeze(-1)
        distances = tc.view(tc.shape[0], -1, 1, 2) - cps.view(1, 1, -1, 2)
        distances = torch.abs(distances).sum(-1)
        result = distances**2 * torch.log(distances + 1e-6) * cpar
        new_coords = transformed + result.sum(dim=2).view(bs, tc.shape[1], 1)
        gx = torch.autograd.grad(new_coords[..., 0].sum(), tc, create_graph=True)
        gy = torch.autograd.grad(new_coords[..., 1].sum(), tc, create_graph=True)
        ref_jac = torch.cat([gx[0].unsqueeze(-2), gy[0].unsqueeze(-2)], dim=-2).detach().numpy()

        got = np.asarray(
            ops.random_transform_jacobian(params, jnp.asarray(coords_np))
        )
        np.testing.assert_allclose(got, ref_jac, atol=1e-4)

    def test_transform_frame_shapes(self):
        key = jax.random.PRNGKey(1)
        params = ops.random_transform_params(key, 2, 0.05, 0.005, 5)
        frame = jnp.asarray(_rand(2, 16, 16, 3, seed=18))
        out = ops.random_transform_frame(params, frame)
        assert out.shape == (2, 16, 16, 3)
