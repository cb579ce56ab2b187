"""Golden parity for the pretrained-backbone consumers + offline converter.

ImageNet weights are unobtainable in this environment (no egress, no
torchvision/lpips packages), so these tests prove the architecture and the
offline conversion path with RANDOM weights: a random-init torch reference
module's state_dict goes through the production converter
(cli/convert_backbones.py / utils/torch_convert.py) and must reproduce the
torch outputs exactly. A real converted weight file is then correct by
construction.

Covers VERDICT round-1 items: VGG19 perceptual (ref modules/model.py:81-123),
LPIPS-vgg (ref reconstruction.py:39), TPSKPDetector
(ref modules/kp_detector.py:136-158), BGMotionPredictor
(ref modules/bg_motion_predictor.py:5-24).
"""
import pytest
import re

import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests import reference_loader
from tests.reference_loader import load_reference
from mrfa_tpu.cli.convert_backbones import (
    VGG16_CONV_IDX,
    VGG19_CONV_IDX,
    convert_lpips_lin,
    convert_vgg_features,
)
from mrfa_tpu.utils.torch_convert import convert_state_dict, merge_into
from mrfa_tpu.weights import load_tree, overlay_vgg19, save_tree

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow

load_reference()

SIZE = 64


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _img(b, s, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, s, s, c).astype(np.float32)


def _assert_close(got, want, rtol=2e-4):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)


class TestVgg19Golden:
    def test_vgg19_perceptual_slices(self, tmp_path):
        """Reference Vgg19 (random init) vs our Vgg19 via the production
        converter + npz vendoring round trip."""
        from modules.model import Vgg19 as RefVgg19

        from mrfa_tpu.nn.vgg import Vgg19

        torch.manual_seed(0)
        ref = RefVgg19().eval()

        # reference repackages torchvision features into slice1..slice5 but
        # keeps the original feature indices as child names -> map back to
        # the torchvision key format the offline converter consumes
        sd = {
            re.sub(r"slice\d+\.", "features.", k): v
            for k, v in ref.state_dict().items()
            if k.startswith("slice")
        }
        tree = convert_vgg_features(sd, VGG19_CONV_IDX)
        path = str(tmp_path / "vgg19_imagenet.npz")
        save_tree(path, tree)
        tree = load_tree(path)

        mod = Vgg19()
        x = _img(2, SIZE, seed=3)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        merged, missing, unexpected = merge_into(variables["params"], tree)
        assert not missing and not unexpected, (missing, unexpected)

        outs = mod.apply({"params": merged}, jnp.asarray(x))
        with torch.no_grad():
            ref_outs = ref(torch.tensor(to_nchw(x)))
        assert len(outs) == len(ref_outs) == 5
        for got, want in zip(outs, ref_outs):
            _assert_close(np.transpose(got, (0, 3, 1, 2)), want.numpy())

    def test_overlay_vgg19(self, tmp_path, monkeypatch):
        """overlay_vgg19 installs vendored weights into the model's vgg
        subtree, and warns (leaving params untouched) when absent."""
        import warnings as W

        import mrfa_tpu.weights as weights_pkg
        from mrfa_tpu.nn.vgg import Vgg19

        mod = Vgg19()
        x = jnp.zeros((1, SIZE, SIZE, 3))
        variables = mod.init(jax.random.PRNGKey(0), x)
        model_vars = {"params": {"vgg": variables["params"]}}

        monkeypatch.setattr(
            weights_pkg, "VGG19_FILE", str(tmp_path / "nope.npz")
        )
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            out = overlay_vgg19(model_vars)
        assert any("RANDOMLY INITIALIZED" in str(r.message) for r in rec)
        assert out is model_vars or out == model_vars

        torch.manual_seed(1)
        tv = reference_loader.vgg19()
        tree = convert_vgg_features(tv.state_dict(), VGG19_CONV_IDX)
        path = str(tmp_path / "vgg19_imagenet.npz")
        save_tree(path, tree)
        monkeypatch.setattr(weights_pkg, "VGG19_FILE", path)
        out = overlay_vgg19(model_vars)
        got = out["params"]["vgg"]["features_0"]["kernel"]
        want = tv.state_dict()["features.0.weight"].numpy().transpose(2, 3, 1, 0)
        np.testing.assert_allclose(np.asarray(got), want, atol=0)


class _TorchLpipsVgg(torch.nn.Module):
    """Pure-torch clone of lpips.LPIPS(net='vgg', spatial=False)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(7)
        self.vgg = reference_loader.vgg16().eval()
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        )
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        )
        # relu boundaries of the 5 lpips slices over vgg16.features
        self.bounds = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
        chans = [64, 128, 256, 512, 512]
        self.lins = torch.nn.ModuleList(
            [torch.nn.Conv2d(c, 1, 1, bias=False) for c in chans]
        )
        for lin in self.lins:  # lpips lin weights are nonnegative
            with torch.no_grad():
                lin.weight.abs_()

    def feats(self, x):
        z = (x - self.shift) / self.scale
        outs = []
        for lo, hi in self.bounds:
            for i in range(lo, hi):
                z = self.vgg.features[i](z)
            outs.append(z)
        return outs

    @staticmethod
    def _norm(t):
        return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

    def forward(self, x, y):
        total = 0.0
        for f0, f1, lin in zip(self.feats(x), self.feats(y), self.lins):
            d = (self._norm(f0) - self._norm(f1)) ** 2
            total = total + lin(d).mean(dim=(2, 3))
        return total[:, 0]

    def lpips_format_state_dict(self):
        sd = {
            k.replace("vgg.", ""): v
            for k, v in self.state_dict().items()
            if k.startswith("vgg.features")
        }
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.weight
        return sd


class TestLpipsGolden:
    def test_lpips_vgg_distance(self):
        """Our LpipsVgg (normalize=False: the reference harness convention,
        reconstruction.py:69) vs a pure-torch lpips clone, converted lin +
        backbone weights."""
        from mrfa_tpu.metrics import LpipsVgg

        ref = _TorchLpipsVgg().eval()
        sd = ref.lpips_format_state_dict()
        tree = convert_vgg_features(sd, VGG16_CONV_IDX)
        tree.update(convert_lpips_lin(sd))

        mod = LpipsVgg(use_linear_weights=True, normalize=False)
        x, y = _img(2, SIZE, seed=11), _img(2, SIZE, seed=12)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
        merged, missing, unexpected = merge_into(variables["params"], tree)
        assert not missing and not unexpected, (missing, unexpected)

        got = mod.apply({"params": merged}, jnp.asarray(x), jnp.asarray(y))
        with torch.no_grad():
            want = ref(torch.tensor(to_nchw(x)), torch.tensor(to_nchw(y)))
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-6
        )


class TestResnet18ConsumersGolden:
    def test_tps_kp_detector(self):
        from modules.kp_detector import TPSKPDetector as RefTPS

        from mrfa_tpu.models.kp_detector import TPSKPDetector

        torch.manual_seed(2)
        ref = RefTPS(num_tps=10).eval()
        mod = TPSKPDetector(num_tps=10)
        x = _img(2, SIZE, seed=5)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        conv = convert_state_dict(ref.state_dict(), strip_prefix=None)
        merged, missing, unexpected = merge_into(variables, conv)
        assert not missing, missing

        got = mod.apply(
            {"params": merged["params"], "batch_stats": merged["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        with torch.no_grad():
            want = ref(torch.tensor(to_nchw(x)))
        _assert_close(got["kp"], want["kp"].numpy(), rtol=1e-4)

    def test_bg_motion_predictor(self):
        from modules.bg_motion_predictor import BGMotionPredictor as RefBG

        from mrfa_tpu.models.bg_motion import BGMotionPredictor

        torch.manual_seed(3)
        ref = RefBG().eval()
        # perturb the identity-init fc so the golden is non-trivial
        with torch.no_grad():
            ref.bg_encoder.fc.weight.normal_(0, 0.01)
        mod = BGMotionPredictor()
        s, d = _img(2, SIZE, seed=6), _img(2, SIZE, seed=7)
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(d)
        )
        conv = convert_state_dict(ref.state_dict(), strip_prefix=None)
        merged, missing, unexpected = merge_into(variables, conv)
        assert not missing, missing

        got = mod.apply(
            {"params": merged["params"], "batch_stats": merged["batch_stats"]},
            jnp.asarray(s), jnp.asarray(d), train=False,
        )
        with torch.no_grad():
            want = ref(torch.tensor(to_nchw(s)), torch.tensor(to_nchw(d)))
        _assert_close(got, want.numpy(), rtol=1e-4)
