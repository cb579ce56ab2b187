"""End-to-end driver tests: reconstruction harness, checkpoint round trip,
torch .pth import — on a tiny synthetic dataset (CPU)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train import SIZE, small_cfg

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    try:
        import imageio.v2 as imageio
    except ImportError:
        import imageio
    root = tmp_path_factory.mktemp("vids")
    rng = np.random.RandomState(0)
    for split, n in [("train", 2), ("test", 2)]:
        for v in range(n):
            vdir = root / split / f"v{v}"
            os.makedirs(vdir)
            for t in range(3):
                imageio.imsave(
                    str(vdir / f"{t:07d}.png"),
                    (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8),
                )
    return str(root)


@pytest.fixture(scope="module")
def tiny_setup():
    from mrfa_tpu.models.mrfa import MRFA

    cfg = small_cfg("fomm")
    cfg["raft_flow"]["prior_only"] = True
    cfg["reconstruction_params"] = {"num_videos": 1, "format": ".mp4"}
    cfg["animate_params"] = {
        "num_pairs": 1,
        "normalization_params": {
            "adapt_movement_scale": False,
            "use_relative_movement": True,
            "use_relative_jacobian": True,
        },
    }
    cfg["visualizer_params"] = {"draw_border": True, "colormap": "gist_rainbow"}
    model = MRFA(cfg)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(
        rngs, dummy, dummy, train=True, compute_loss=True, use_bg=True
    )
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    return cfg, model, variables


class TestReconstruction:
    def test_reconstruction_harness(self, tiny_setup, synthetic_root, tmp_path):
        from mrfa_tpu.data.dataset import FramesDataset
        from mrfa_tpu.evals import reconstruction

        cfg, model, variables = tiny_setup
        ds = FramesDataset(synthetic_root, frame_shape=(SIZE, SIZE, 3), is_train=False)
        results = reconstruction(
            cfg, model, variables, str(tmp_path), ds, save_visualizations=True
        )
        assert results["frames"] == 6  # 2 videos x 3 frames
        assert np.isfinite(results["l1"]) and results["l1"] > 0
        assert np.isfinite(results["psnr"])
        assert np.isfinite(results["lpips"])
        assert os.path.exists(os.path.join(tmp_path, "reconstruction/png"))


class TestCheckpoint:
    def test_orbax_roundtrip(self, tiny_setup, tmp_path):
        from mrfa_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

        _, _, variables = tiny_setup
        tree = {"params": variables["params"], "epoch": 3}
        save_checkpoint(str(tmp_path / "ckpt"), tree, step=3)
        restored, step = restore_checkpoint(str(tmp_path / "ckpt"), tree)
        assert step == 3
        a = jax.tree.leaves(variables["params"])[0]
        b = jax.tree.leaves(restored["params"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_torch_pth_import(self, tiny_setup, tmp_path):
        """A reference-format .pth (module.-prefixed) loads into variables."""
        import torch

        from tests.reference_loader import load_reference

        load_reference()
        from modules.kp_detector import KPDetector as RefKP

        from mrfa_tpu.models.kp_detector import KPDetector
        from mrfa_tpu.utils.checkpoint import load_torch_weights_into

        kp_cfg = dict(
            block_expansion=32, num_kp=10, num_channels=3, max_features=1024,
            num_blocks=5, temperature=0.1, scale_factor=0.25,
            estimate_jacobian=True,
        )
        ref = RefKP(**kp_cfg)
        sd = {"module.encoder." + k: v for k, v in ref.state_dict().items()}
        path = str(tmp_path / "ck.pth")
        torch.save({"model": sd, "epoch": 7}, path)

        mod = KPDetector(**kp_cfg)
        x = jnp.zeros((1, SIZE, SIZE, 3))
        variables = {"encoder": None}
        inner = mod.init(jax.random.PRNGKey(0), x)
        variables = {
            "params": {"encoder": inner["params"]},
            "batch_stats": {"encoder": inner["batch_stats"]},
        }
        merged, missing, unexpected = load_torch_weights_into(
            variables, path, verbose=False
        )
        assert not missing, missing
        ref_w = ref.state_dict()["kp.weight"].numpy()
        got = np.asarray(merged["params"]["encoder"]["kp"]["kernel"])
        np.testing.assert_allclose(got, ref_w.transpose(2, 3, 1, 0))
