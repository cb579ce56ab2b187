"""L0 op parity tests vs torch CPU goldens (grid-sample matrix, resize, pools)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mrfa_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestCoordinateGrids:
    def test_make_coordinate_grid(self):
        ref = torch.cat(
            [
                (2 * (torch.arange(7).float() / 6) - 1).view(1, -1).repeat(5, 1).unsqueeze(2),
                (2 * (torch.arange(5).float() / 4) - 1).view(-1, 1).repeat(1, 7).unsqueeze(2),
            ],
            2,
        ).numpy()
        got = np.asarray(ops.make_coordinate_grid(5, 7))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_coords_grid(self):
        g = np.asarray(ops.coords_grid(4, 6))
        assert g.shape == (4, 6, 2)
        assert g[2, 5, 0] == 5 and g[2, 5, 1] == 2  # xy order

    def test_kp2gaussian(self):
        kp = _rand(2, 10, 2) * 0.8
        # torch-side golden computed directly from the formula
        grid = np.asarray(ops.make_coordinate_grid(16, 16))
        diff = grid[None, None] - kp[:, :, None, None, :]
        ref = np.exp(-0.5 * (diff**2).sum(-1) / 0.01)  # (B,K,h,w)
        got = np.asarray(ops.kp2gaussian(jnp.asarray(kp), (16, 16), 0.01))
        np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
class TestGridSample:
    def test_matches_torch(self, align, padding):
        img = _rand(2, 9, 11, 3, seed=1)
        # grid partially out of bounds to exercise padding
        grid = (_rand(2, 5, 6, 2, seed=2) * 1.4).clip(-2.5, 2.5)
        ref = F.grid_sample(
            torch.tensor(to_nchw(img)),
            torch.tensor(grid),
            mode="bilinear",
            padding_mode=padding,
            align_corners=align,
        ).numpy()
        got = np.asarray(
            ops.grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=align, padding_mode=padding)
        )
        np.testing.assert_allclose(got, to_nhwc(ref), atol=1e-5)


class TestSamplePixel:
    def test_matches_reference_bilinear_sampler(self):
        """sample_pixel == reference bilinear_sampler (pixel coords, align=True)."""
        img = _rand(2, 8, 8, 4, seed=3)
        coords = _rand(2, 6, 7, 2, seed=4) * 4 + 3.5
        # reference semantics: normalize by (W-1), grid_sample align_corners=True
        t_img = torch.tensor(to_nchw(img))
        t_coords = torch.tensor(coords)
        xg = 2 * t_coords[..., 0:1] / (8 - 1) - 1
        yg = 2 * t_coords[..., 1:2] / (8 - 1) - 1
        ref = F.grid_sample(
            t_img, torch.cat([xg, yg], -1), align_corners=True
        ).numpy()
        got, m = ops.sample_pixel(jnp.asarray(img), jnp.asarray(coords), mask=True)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)
        ref_mask = ((xg > -1) & (yg > -1) & (xg < 1) & (yg < 1)).float().numpy()
        np.testing.assert_allclose(np.asarray(m), ref_mask, atol=0)


class TestWarpGradients:
    """The warp backward is a custom matmul-form splat (no XLA scatter, see
    ops/sampler.py::_splat_mats); pin it to torch autograd through every
    channel branch (patch4 rows / (2,2,C) slice gather / wide 4-tap)."""

    @pytest.mark.parametrize(
        "c,lean", [(3, False), (40, False), (70, False), (130, False),
                   (3, True), (70, True), (40, "patch"), (130, "patch")],
    )
    def test_sample_pixel_vjp_matches_torch(self, c, lean):
        import jax

        b, h, w, n = 2, 9, 11, 23
        img = _rand(b, h, w, c, seed=5)
        coords = np.stack(
            [
                _rand(b, n, seed=6) * (w + 3) - 1.5,
                _rand(b, n, seed=7) * (h + 3) - 1.5,
            ],
            axis=-1,
        ).astype(np.float32)
        g = _rand(b, n, c, seed=8)

        t_img = torch.tensor(to_nchw(img), requires_grad=True)
        t_coords = torch.tensor(coords[:, :, None, :], requires_grad=True)
        xg = 2 * t_coords[..., 0:1] / (w - 1) - 1
        yg = 2 * t_coords[..., 1:2] / (h - 1) - 1
        ref = F.grid_sample(t_img, torch.cat([xg, yg], -1), align_corners=True)
        ref.backward(torch.tensor(g.transpose(0, 2, 1)[:, :, :, None]))

        out, vjp = jax.vjp(
            lambda im, cc: ops.sample_pixel(im, cc, lean=lean),
            jnp.asarray(img), jnp.asarray(coords),
        )
        d_img, d_coords = vjp(jnp.asarray(g))
        np.testing.assert_allclose(
            np.asarray(d_img), to_nhwc(t_img.grad.numpy()), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_coords),
            t_coords.grad.numpy()[:, :, 0, :],
            atol=2e-4,
        )


class TestResize:
    @pytest.mark.parametrize("align", [True, False])
    @pytest.mark.parametrize("size", [(16, 16), (5, 9), (32, 32), (7, 7)])
    def test_bilinear(self, align, size):
        img = _rand(2, 13, 13, 3, seed=5)
        ref = F.interpolate(
            torch.tensor(to_nchw(img)), size=size, mode="bilinear", align_corners=align
        ).numpy()
        got = np.asarray(ops.resize_bilinear(jnp.asarray(img), size, align_corners=align))
        np.testing.assert_allclose(got, to_nhwc(ref), atol=1e-5)

    def test_upsample_nearest(self):
        img = _rand(1, 4, 4, 2, seed=6)
        ref = F.interpolate(torch.tensor(to_nchw(img)), scale_factor=2).numpy()
        got = np.asarray(ops.upsample_nearest(jnp.asarray(img), 2))
        np.testing.assert_allclose(got, to_nhwc(ref), atol=0)

    def test_downsample_nearest(self):
        img = _rand(1, 16, 16, 2, seed=7)
        ref = F.interpolate(torch.tensor(to_nchw(img)), scale_factor=(0.25, 0.25)).numpy()
        got = np.asarray(ops.downsample_nearest(jnp.asarray(img), 4))
        np.testing.assert_allclose(got, to_nhwc(ref), atol=0)

    @pytest.mark.parametrize("k", [2, 4])
    def test_avg_pool(self, k):
        img = _rand(2, 16, 16, 3, seed=8)
        ref = F.avg_pool2d(torch.tensor(to_nchw(img)), k, stride=k).numpy()
        got = np.asarray(ops.avg_pool(jnp.asarray(img), k))
        np.testing.assert_allclose(got, to_nhwc(ref), atol=1e-6)


class TestAntiAlias:
    @pytest.mark.parametrize("scale", [0.5, 0.25, 0.125])
    def test_matches_torch_pipeline(self, scale):
        """Matches gaussian blur (depthwise conv) + nearest subsample."""
        img = _rand(2, 32, 32, 3, seed=9)
        sigma = (1 / scale - 1) / 2
        ksize = 2 * round(sigma * 4) + 1
        ka = ksize // 2
        # torch-side golden
        ax = torch.arange(ksize).float()
        k1 = torch.exp(-((ax - (ksize - 1) / 2) ** 2) / (2 * sigma**2))
        k2 = torch.outer(k1, k1)
        k2 = k2 / k2.sum()
        weight = k2.view(1, 1, ksize, ksize).repeat(3, 1, 1, 1)
        t = torch.tensor(to_nchw(img))
        t = F.pad(t, (ka, ka, ka, ka))
        t = F.conv2d(t, weight, groups=3)
        ref = F.interpolate(t, scale_factor=(scale, scale)).numpy()

        params = ops.AntiAliasParams.create(scale)
        got = np.asarray(ops.antialias_downsample(jnp.asarray(img), params))
        np.testing.assert_allclose(got, to_nhwc(ref), atol=1e-4)

    def test_identity(self):
        img = jnp.asarray(_rand(1, 8, 8, 3))
        params = ops.AntiAliasParams.create(1.0)
        assert np.asarray(ops.antialias_downsample(img, params)).shape == (1, 8, 8, 3)


class TestSpaceToDepthConv:
    """The s2d form of the generator's final 7x7 conv is exactly the direct
    conv (same canonical (7,7,C,O) parameter, rearranged at trace time)."""

    def test_matches_direct_conv(self):
        import jax
        import jax.numpy as jnp

        from mrfa_tpu.nn.blocks import SpaceToDepthConv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 32, 32, 6).astype(np.float32))
        mod = SpaceToDepthConv(3)
        variables = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(variables, x)

        k = variables["params"]["kernel"]
        b = variables["params"]["bias"]
        want = (
            jax.lax.conv_general_dilated(
                x, k, (1, 1), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_fallback_non_multiple_of_4(self):
        import jax
        import jax.numpy as jnp

        from mrfa_tpu.nn.blocks import SpaceToDepthConv

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 30, 30, 4).astype(np.float32))
        mod = SpaceToDepthConv(2)
        variables = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(variables, x)
        assert out.shape == (1, 30, 30, 2)


class TestTapsConv:
    """TapsConv (tap-matmul conv for MXU-hostile channel shapes) matches the
    direct lax.conv for both modes, including the production shapes it
    replaces (convf1 7x7 2->128, conv2 3x3 128->2, mask 7x7 108->11)."""

    @pytest.mark.parametrize(
        "k,pad,cin,cout,mode",
        [
            (7, 3, 2, 128, "in"),    # BasicMotionEncoder.convf1
            (3, 1, 128, 2, "out"),   # RefineFlow.conv2
            (3, 1, 128, 1, "out"),   # RefineFlow.convo2
            (7, 3, 108, 11, "out"),  # DenseMotionNetwork.mask
            (7, 3, 108, 1, "out"),   # DenseMotionNetwork.occlusion
        ],
    )
    def test_matches_direct_conv(self, k, pad, cin, cout, mode):
        import jax
        import jax.numpy as jnp

        from mrfa_tpu.nn.blocks import TapsConv

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 16, cin).astype(np.float32))
        mod = TapsConv(features=cout, kernel_size=k, padding=pad, mode=mode)
        variables = mod.init(jax.random.PRNGKey(0), x)
        got = mod.apply(variables, x)

        kern = variables["params"]["kernel"]
        b = variables["params"]["bias"]
        assert kern.shape == (k, k, cin, cout)  # torch-convertible layout
        want = (
            jax.lax.conv_general_dilated(
                x, kern, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
