"""Composite train-forward golden: reference MRFA.forward(x, epoch,
is_train=True) vs our MRFA in train mode — the full assembled training graph
(/root/reference/modules/model.py:183-257): perceptual pyramid loss on the
(random-init) VGG19, keypoint + jacobian equivariance under an identical
injected random transform, background consistency, and train-mode BatchNorm
running-stat updates.

Round-1 VERDICT item 3: every sub-module had an eval-mode golden; this pins
the composite loss values and the BN side effects.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference
from mrfa_tpu.utils.checkpoint import remap_reference_keys
from mrfa_tpu.utils.torch_convert import convert_state_dict, merge_into

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow

load_reference()

SIZE = 128
BS = 2


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


MTIA_CFG = {
    "MODEL": {
        "ESTIMATE_JACOBIAN": True, "DATA_PREPROCESS": False,
        "FIX_IMG2MOTION_ATTENTION": False, "TRANSFORMER_DEPTH": 12,
        "TRANSFORMER_HEADS": 8, "DIM": 192, "INIT_WEIGHTS": False,
        "NAME": "pose_tokenpose_b", "NUM_JOINTS": 10, "PRETRAINED": "",
        "PATCH_SIZE": [4, 4], "IMAGE_SIZE": [SIZE, SIZE],
        "HEATMAP_SIZE": [SIZE // 4, SIZE // 4], "TAG_PER_JOINT": True,
        "HIDDEN_HEATMAP_DIM": -1, "NUM_BRANCHES": 1, "BASE_CHANNEL": 32,
        "TRANSFORMER_MLP_RATIO": 3, "POS_EMBEDDING_TYPE": "sine-full",
        "TEMPERATURE": 0.1, "TARGET_TYPE": "gaussian", "INIT": True,
        "SIGMA": 2,
        "EXTRA": {
            "FINAL_CONV_KERNEL": 1,
            "PRETRAINED_LAYERS": ["*"],
            "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                       "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [32, 64],
                       "FUSE_METHOD": "SUM"},
            "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                       "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [32, 64, 128],
                       "FUSE_METHOD": "SUM"},
        },
    }
}


def composite_cfg(prior="fomm"):
    cfg = {
        "mtia_kp_detector": MTIA_CFG,
        "train_params": {
            "prior_model": prior,
            "num_epochs": 100,
            "bg_start": 0,
            "epoch_milestones": [60, 90],
            "lr": 2.0e-4,
            "batch_size": BS,
            "scales": [1, 0.25],
            "transform_params": {
                "sigma_affine": 0.05, "sigma_tps": 0.005, "points_tps": 5,
            },
            "loss_weights": {
                "perceptual": [10, 10, 10, 10, 10],
                "equivariance": 10,
                "equivariance_jacobian": 10,
            },
        },
        "dense_motion": {
            "block_expansion": 64, "max_features": 1024, "num_blocks": 5,
            "scale_factor": 0.25, "num_kp": 10, "num_channels": 3,
            "estimate_occlusion_map": True,
        },
        "fomm_kp_detector": {
            "block_expansion": 32, "num_kp": 10, "num_channels": 3,
            "max_features": 1024, "num_blocks": 5, "temperature": 0.1,
            "scale_factor": 0.25, "estimate_jacobian": True,
        },
        "raft_flow": {
            "prior_only": False, "num_kp": 10, "dim": 256, "size": SIZE,
            "generator": {
                "num_channels": 3, "block_expansion": 64,
                "max_features": 512, "num_up_blocks": 5,
            },
            "driving_encoder": {
                "in_features": 10, "block_expansion": 32,
                "max_features": 512, "num_blocks": 5,
            },
            "source_encoder": {
                "in_features": 13, "block_expansion": 32,
                "max_features": 512, "num_blocks": 5,
            },
        },
    }
    if prior == "tpsm":
        cfg["tpsm_kp_detector"] = {"num_tps": 10}
        cfg["tpsm_dense_motion"] = {
            "block_expansion": 64, "max_features": 1024, "num_blocks": 5,
            "scale_factor": 0.25, "num_tps": 10, "num_channels": 3,
        }
        # dropout OFF at epoch 0 (dropout_epoch=0): the reference samples
        # torch dropout masks that cannot be replayed cross-framework; the
        # dropout-ON schedule itself is covered by
        # tests/test_train_loop.py::test_tpsm_dropout_train_step
        cfg["train_params"].update(
            dropout_epoch=0, dropout_maxp=0.3, dropout_startp=0.1,
            dropout_inc_epoch=10,
        )
        # TPSKPDetector emits no jacobian: the reference would crash on the
        # jacobian term (model.py:240-241 indexes kp['jacobian']) — weight 0
        # matches how TPSM is actually trained (config has no jacobian loss)
        cfg["train_params"]["loss_weights"]["equivariance_jacobian"] = 0
    return cfg


def _fixed_transform(seed=42):
    """One shared draw of the equivariance transform for both frameworks."""
    rng = np.random.RandomState(seed)
    theta = (
        np.eye(2, 3, dtype=np.float32)[None]
        + 0.05 * rng.randn(BS, 2, 3).astype(np.float32)
    )
    control_params = 0.005 * rng.randn(BS, 1, 25).astype(np.float32)
    return theta, control_params


@pytest.fixture(scope="module", params=["fomm", "mtia", "tpsm"])
def golden(request, tmp_path_factory):
    """Run the reference composite forward once (torch CPU, injected
    transform), returning its outputs + pre/post state dicts. Parametrized
    over the FOMM and the flagship MTIA (HRNet + TokenPose) priors."""
    import modules.model as ref_model_mod
    from modules.util import convert_dict_to_attrit_dict

    theta, control_params = _fixed_transform()

    # reference constructs ImagePyramide/Vgg19 with .cuda() in __init__
    # (model.py:155-157); run CPU-side
    orig_cuda = torch.nn.Module.cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # inject the fixed transform draw (reference samples inside forward,
    # model.py:31-40)
    orig_init = ref_model_mod.Transform.__init__

    def fixed_init(self, bs, **kwargs):
        orig_init(self, bs, **kwargs)
        self.theta = torch.tensor(theta)
        self.control_params = torch.tensor(control_params)

    ref_model_mod.Transform.__init__ = fixed_init
    try:
        torch.manual_seed(0)
        cfg = composite_cfg(request.param)
        ref = ref_model_mod.MRFA(convert_dict_to_attrit_dict(cfg))
        ref.train()
        sd_before = {
            k: v.detach().clone() for k, v in ref.state_dict().items()
        }

        rng = np.random.RandomState(1)
        source = rng.rand(BS, SIZE, SIZE, 3).astype(np.float32)
        driving = rng.rand(BS, SIZE, SIZE, 3).astype(np.float32)
        # no torch.no_grad(): the reference equivariance-jacobian term runs
        # autograd.grad on the transformed keypoints (model.py:72-77)
        gen, warp_vis, losses, kp_s, kp_d = ref(
            {
                "source": torch.tensor(to_nchw(source)),
                "driving": torch.tensor(to_nchw(driving)),
            },
            epoch=0,
            is_train=True,
        )
        gen = gen.detach()
        losses = {k: v.detach() for k, v in losses.items()}
        kp_s, kp_d = kp_s.detach(), kp_d.detach()
        sd_after = {k: v.detach().clone() for k, v in ref.state_dict().items()}
        return {
            "cfg": cfg,
            "source": source,
            "driving": driving,
            "theta": theta,
            "control_params": control_params,
            "gen": gen.numpy(),
            "losses": {k: float(v.mean()) for k, v in losses.items()},
            "kp_s": kp_s.numpy(),
            "kp_d": kp_d.numpy(),
            "sd_before": sd_before,
            "sd_after": sd_after,
        }
    finally:
        torch.nn.Module.cuda = orig_cuda
        ref_model_mod.Transform.__init__ = orig_init


class TestCompositeTrainForward:
    def test_losses_and_bn_updates(self, golden, monkeypatch):
        import mrfa_tpu.models.mrfa as mrfa_mod
        from mrfa_tpu.models.mrfa import MRFA
        from mrfa_tpu.ops.tps import RandomTransformParams
        from mrfa_tpu.ops.grid import make_coordinate_grid

        cfg = golden["cfg"]
        model = MRFA(cfg)
        src = jnp.asarray(golden["source"])
        drv = jnp.asarray(golden["driving"])
        rngs = {
            "params": jax.random.PRNGKey(0),
            "equivariance": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        }
        variables = model.init(
            rngs, src, drv, train=True, compute_loss=True, use_bg=True
        )

        conv = convert_state_dict(remap_reference_keys(golden["sd_before"]))
        variables, missing, unexpected = merge_into(variables, conv)
        assert not missing, missing[:10]

        # inject the same transform draw the reference used
        cps = make_coordinate_grid(5, 5).reshape(1, 25, 2)
        fixed = RandomTransformParams(
            theta=jnp.asarray(golden["theta"]),
            control_points=cps,
            control_params=jnp.asarray(golden["control_params"]),
        )
        monkeypatch.setattr(
            mrfa_mod, "random_transform_params", lambda *a, **k: fixed
        )

        (gen, warp_vis, losses, kp_s, kp_d), mutated = model.apply(
            variables, src, drv,
            train=True, compute_loss=True, use_bg=True,
            rngs=rngs, mutable=["batch_stats"],
        )

        # ---- loss terms (reference train.py:56-62 means each term) ----
        assert set(losses) == set(golden["losses"]), (
            set(losses), set(golden["losses"]))
        for k, want in golden["losses"].items():
            got = float(jnp.mean(losses[k]))
            assert np.isfinite(got)
            np.testing.assert_allclose(
                got, want, rtol=2e-3, atol=2e-3 * max(1.0, abs(want)),
                err_msg=f"loss term {k}",
            )

        # ---- generated image + keypoints ----
        # TPSM runs a batched TPS solve whose f32 result is solver-order
        # sensitive (see test_tps.py); its image tolerance is looser
        tpsm = cfg["train_params"]["prior_model"] == "tpsm"
        np.testing.assert_allclose(
            to_nchw(np.asarray(gen)), golden["gen"],
            atol=5e-3 if tpsm else 2e-3,
        )
        np.testing.assert_allclose(np.asarray(kp_s), golden["kp_s"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(kp_d), golden["kp_d"], atol=1e-4)

        # ---- post-forward BN running stats (train-mode side effects) ----
        conv_after = convert_state_dict(remap_reference_keys(golden["sd_after"]))
        want_bs = conv_after["batch_stats"]
        got_bs = mutated["batch_stats"]

        flat_want = jax.tree_util.tree_leaves_with_path(want_bs)
        flat_got = jax.tree_util.tree_leaves_with_path(got_bs)
        # identical tree structure is implied by the merge above
        assert len(flat_want) == len(flat_got)
        for (pw, w), (pg, g) in zip(flat_want, flat_got):
            assert pw == pg
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-3,
                atol=1e-3 * max(1.0, float(np.abs(np.asarray(w)).max())),
                err_msg=f"batch_stats {pw}",
            )
