"""Golden-value parity: reference torch modules (random init, converted
weights) vs the mrfa_tpu flax modules, eval mode, CPU f32.

This validates both the module semantics and the mechanical checkpoint
converter — the same path a real released checkpoint takes.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference
from mrfa_tpu.utils.torch_convert import convert_state_dict, merge_into

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow

load_reference()

SIZE = 128  # smallest size compatible with the real 5-block hourglass configs
H4 = SIZE // 4


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _img(b, s, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, s, s, c).astype(np.float32)


def convert_and_merge(flax_module, variables, torch_module, **kwargs):
    conv = convert_state_dict(torch_module.state_dict(), strip_prefix=None)
    merged, missing, unexpected = merge_into(variables, conv, **kwargs)
    assert not [m for m in missing if "mismatch" in m], missing
    return merged, missing, unexpected


class TestKPDetectorGolden:
    def test_fomm_kp_detector(self):
        from modules.kp_detector import KPDetector as RefKP
        from mrfa_tpu.models.kp_detector import KPDetector

        cfg = dict(
            block_expansion=32, num_kp=10, num_channels=3, max_features=1024,
            num_blocks=5, temperature=0.1, scale_factor=0.25,
            estimate_jacobian=True,
        )
        ref = RefKP(**cfg, estimate_occlusion=False).eval()
        mod = KPDetector(**cfg)
        x = _img(2, SIZE, seed=1)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing

        with torch.no_grad():
            ref_out = ref(torch.tensor(to_nchw(x)))
        out = mod.apply(merged, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["kp"]), ref_out["kp"].numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["jacobian"]), ref_out["jacobian"].numpy(), atol=2e-4
        )


class TestGeneratorGolden:
    def test_encode_decode(self):
        from modules.generator import OcclusionAwareGenerator as RefGen
        from mrfa_tpu.models.generator import OcclusionAwareGenerator

        cfg = dict(num_channels=3, block_expansion=64, max_features=512, num_up_blocks=5)
        ref = RefGen(**cfg).eval()
        mod = OcclusionAwareGenerator(**cfg)
        x = _img(1, SIZE, seed=2)

        # init via a full decode pass including the coarse branch
        rng = np.random.RandomState(3)
        def make_lists(feats_shapes):
            warps, occs, warps_c = [], [], []
            for (b, h, w, c) in feats_shapes:
                warps.append(rng.randn(b, h, w, c).astype(np.float32))
                warps_c.append(rng.randn(b, h, w, c).astype(np.float32))
                occs.append(rng.rand(b, h, w, 1).astype(np.float32))
            return warps, occs, warps_c

        feats_shapes = [(1, SIZE // 2**i, SIZE // 2**i, min(512, 64 * 2**i)) for i in range(5, -1, -1)]
        warps, occs, warps_c = make_lists(feats_shapes)
        warp_img = _img(1, SIZE, seed=4)

        def fwd(mdl, xx):
            f = mdl.encode(xx, False)
            d = mdl.decode(
                [jnp.asarray(w) for w in warps],
                jnp.asarray(warp_img),
                [jnp.asarray(o) for o in occs],
                [jnp.asarray(w) for w in warps_c],
                [jnp.asarray(o) for o in occs],
                train=False,
            )
            return f, d

        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), method=fwd)
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing

        with torch.no_grad():
            ref_f = ref.encode(torch.tensor(to_nchw(x)))
            ref_d = ref.decode(
                [torch.tensor(to_nchw(w)) for w in warps],
                torch.tensor(to_nchw(warp_img)),
                [torch.tensor(to_nchw(o)) for o in occs],
                [torch.tensor(to_nchw(w)) for w in warps_c],
                [torch.tensor(to_nchw(o)) for o in occs],
            )
        f, d = mod.apply(merged, jnp.asarray(x), method=fwd)
        for i, (mine, theirs) in enumerate(zip(f, ref_f)):
            np.testing.assert_allclose(
                np.asarray(mine), to_nhwc(theirs.numpy()), atol=5e-4,
                err_msg=f"encode level {i}",
            )
        np.testing.assert_allclose(np.asarray(d), to_nhwc(ref_d.numpy()), atol=5e-4)


class TestDenseMotionGolden:
    def test_dense_motion_fomm(self):
        from modules.dense_motion import DenseMotionNetwork as RefDM
        from mrfa_tpu.models.dense_motion import DenseMotionNetwork

        cfg = dict(
            block_expansion=64, max_features=1024, num_blocks=5,
            scale_factor=0.25, num_kp=10, num_channels=3,
            estimate_occlusion_map=True,
        )
        ref = RefDM(**cfg).eval()
        mod = DenseMotionNetwork(**cfg)

        rng = np.random.RandomState(5)
        x = _img(2, SIZE, seed=6)
        kp_s = np.tanh(rng.randn(2, 10, 2)).astype(np.float32)
        kp_d = np.tanh(rng.randn(2, 10, 2)).astype(np.float32)
        jac_s = (np.eye(2) + 0.1 * rng.randn(2, 10, 2, 2)).astype(np.float32)
        jac_d = (np.eye(2) + 0.1 * rng.randn(2, 10, 2, 2)).astype(np.float32)
        bg = (np.eye(3) + 0.05 * rng.randn(2, 3, 3)).astype(np.float32)
        bg[:, 2, :] = [0, 0, 1]

        kps_j = {"kp": jnp.asarray(kp_s), "jacobian": jnp.asarray(jac_s)}
        kpd_j = {"kp": jnp.asarray(kp_d), "jacobian": jnp.asarray(jac_d)}
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(x), kpd_j, kps_j,
            bg_param=jnp.asarray(bg),
        )
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing

        with torch.no_grad():
            ref_out = ref(
                torch.tensor(to_nchw(x)),
                {"kp": torch.tensor(kp_d), "jacobian": torch.tensor(jac_d)},
                {"kp": torch.tensor(kp_s), "jacobian": torch.tensor(jac_s)},
                bg_param=torch.tensor(bg),
            )
        out = mod.apply(merged, jnp.asarray(x), kpd_j, kps_j, bg_param=jnp.asarray(bg))
        np.testing.assert_allclose(
            np.asarray(out["deformation"]), ref_out["deformation"].numpy(), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["occlusion"]),
            to_nhwc(ref_out["occlusion"].numpy()),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["mask"]),
            np.transpose(ref_out["mask"].numpy(), (0, 2, 3, 1)),
            atol=5e-4,
        )


class TestTPSDenseMotionGolden:
    def test_tps_dense_motion(self):
        from modules.dense_motion import TPSDenseMotionNetwork as RefTDM
        from mrfa_tpu.models.dense_motion import TPSDenseMotionNetwork

        cfg = dict(
            block_expansion=64, max_features=1024, num_blocks=5,
            scale_factor=0.25, num_tps=10, num_channels=3,
        )
        ref = RefTDM(**cfg).eval()
        mod = TPSDenseMotionNetwork(**cfg)

        rng = np.random.RandomState(21)
        x = _img(1, SIZE, seed=22)
        kp_d = np.tanh(rng.randn(1, 50, 2)).astype(np.float32)
        kp_s = np.tanh(rng.randn(1, 50, 2)).astype(np.float32)
        bg = (np.eye(3) + 0.05 * rng.randn(1, 3, 3)).astype(np.float32)
        bg[:, 2, :] = [0, 0, 1]

        kpd_j = {"kp": jnp.asarray(kp_d)}
        kps_j = {"kp": jnp.asarray(kp_s)}
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(x), kpd_j, kps_j,
            bg_param=jnp.asarray(bg),
        )
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing

        with torch.no_grad():
            ref_out = ref(
                torch.tensor(to_nchw(x)),
                {"kp": torch.tensor(kp_d)},
                {"kp": torch.tensor(kp_s)},
                bg_param=torch.tensor(bg),
            )
        out = mod.apply(merged, jnp.asarray(x), kpd_j, kps_j, bg_param=jnp.asarray(bg))
        # TPS solve is f32 solver-order sensitive (see test_tps.py); the
        # deformation field tolerance is correspondingly looser.
        np.testing.assert_allclose(
            np.asarray(out["deformation"]), ref_out["deformation"].numpy(), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["occlusion"]),
            to_nhwc(ref_out["occlusion"].numpy()),
            atol=5e-3,
        )


class TestTokenPoseGolden:
    def test_mtia_encoder(self):
        from modules.transformer.pose_tokenpose_b import get_pose_net
        from modules.util import convert_dict_to_attrit_dict
        from mrfa_tpu.models.mrfa import mtia_encoder_from_cfg

        mcfg = {
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
        ref = get_pose_net(convert_dict_to_attrit_dict(mcfg), is_train=False).eval()
        mod = mtia_encoder_from_cfg(mcfg, name=None)

        x = _img(1, SIZE, seed=7)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing
        # only the fixed sine pos embedding should be unconvertible
        assert all("pos_embedding" in u for u in unexpected), unexpected

        with torch.no_grad():
            ref_out = ref(torch.tensor(to_nchw(x)))
        out = mod.apply(merged, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out["kp"]), ref_out["kp"].numpy(), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["jacobian"]), ref_out["jacobian"].numpy(), atol=5e-4
        )


class TestRaftFlowGolden:
    @pytest.mark.parametrize("prior_only", [False, True])
    def test_raft_flow(self, prior_only):
        from modules.raft import RaftFlow as RefRaft
        from mrfa_tpu.models.raft import RaftFlow

        gen_cfg = dict(num_channels=3, block_expansion=64, max_features=512, num_up_blocks=5)
        drv_cfg = dict(in_features=10, block_expansion=32, max_features=512, num_blocks=5)
        src_cfg = dict(in_features=13, block_expansion=32, max_features=512, num_blocks=5)
        ref = RefRaft(
            prior_only=prior_only, num_kp=10, dim=256, size=SIZE,
            generator=gen_cfg, driving_encoder=drv_cfg, source_encoder=src_cfg,
        ).eval()
        mod = RaftFlow(
            prior_only=prior_only, num_kp=10, dim=256, size=SIZE,
            generator=gen_cfg, driving_encoder=drv_cfg, source_encoder=src_cfg,
        )

        rng = np.random.RandomState(8)
        kp_s = np.tanh(rng.randn(1, 10, 2)).astype(np.float32)
        kp_d = np.tanh(rng.randn(1, 10, 2)).astype(np.float32)
        deformation = np.tanh(rng.randn(1, H4, H4, 2) * 0.5).astype(np.float32)
        occlusion = rng.randn(1, H4, H4, 1).astype(np.float32)
        img = _img(1, H4, seed=9)
        img_full = _img(1, SIZE, seed=10)

        dm_j = {"deformation": jnp.asarray(deformation), "occlusion": jnp.asarray(occlusion)}
        variables = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(kp_s), jnp.asarray(kp_d), dm_j,
            jnp.asarray(img), jnp.asarray(img_full),
        )
        merged, missing, unexpected = convert_and_merge(mod, variables, ref)
        assert not missing, missing

        dm_t = {
            "deformation": torch.tensor(deformation),
            "occlusion": torch.tensor(to_nchw(occlusion)),
        }
        with torch.no_grad():
            ref_out, ref_warp, ref_occ = ref(
                torch.tensor(kp_s), torch.tensor(kp_d), dm_t,
                torch.tensor(to_nchw(img)), torch.tensor(to_nchw(img_full)),
            )
        out, warp, occ = mod.apply(
            merged, jnp.asarray(kp_s), jnp.asarray(kp_d), dm_j,
            jnp.asarray(img), jnp.asarray(img_full),
        )
        np.testing.assert_allclose(
            np.asarray(warp), to_nhwc(ref_warp.numpy()), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out), to_nhwc(ref_out.numpy()), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(occ), to_nhwc(ref_occ.numpy()), atol=1e-3
        )
