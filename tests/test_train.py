"""Training-step tests: sharded step runs, losses finite, masking correct."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.parallel.mesh import make_mesh, shard_batch
from mrfa_tpu.train.optim import (
    BG_SUBTREES,
    MAIN_SUBTREES,
    clip_inf_norm_subtrees,
    make_optimizer,
    multistep_lr,
)
from mrfa_tpu.train.trainer import create_train_state, make_train_step

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow

SIZE = 128


def small_cfg(prior="fomm"):
    return {
        "train_params": {
            "prior_model": prior,
            "num_epochs": 100,
            "bg_start": 0,
            "epoch_milestones": [60, 90],
            "lr": 2.0e-4,
            "batch_size": 2,
            "scales": [1, 0.25],
            "clip_grad": True,
            "clip": 10,
            "transform_params": {"sigma_affine": 0.05, "sigma_tps": 0.005, "points_tps": 5},
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
        "tpsm_kp_detector": {"num_tps": 10},
        # reduced-depth MTIA (2 ViT layers instead of 12): mesh-equivalence
        # tests are semantics-preservation checks, so a small config
        # exercises the same HRNet/patchify/attention partitioning
        "mtia_kp_detector": {
            "MODEL": {
                "ESTIMATE_JACOBIAN": True, "TRANSFORMER_DEPTH": 2,
                "TRANSFORMER_HEADS": 8, "DIM": 192, "NUM_JOINTS": 10,
                "PATCH_SIZE": [4, 4], "IMAGE_SIZE": [SIZE, SIZE],
                "BASE_CHANNEL": 32, "TRANSFORMER_MLP_RATIO": 3,
            }
        },
        "tpsm_dense_motion": {
            "block_expansion": 64, "max_features": 1024, "num_blocks": 5,
            "scale_factor": 0.25, "num_tps": 10, "num_channels": 3,
        },
        "raft_flow": {
            "prior_only": False, "num_kp": 10, "dim": 256, "size": SIZE,
            "generator": {"num_channels": 3, "block_expansion": 64, "max_features": 512, "num_up_blocks": 5},
            "driving_encoder": {"in_features": 10, "block_expansion": 32, "max_features": 512, "num_blocks": 5},
            "source_encoder": {"in_features": 13, "block_expansion": 32, "max_features": 512, "num_blocks": 5},
        },
    }


class TestOptim:
    def test_multistep_lr(self):
        sched = multistep_lr(2e-4, [60, 90], steps_per_epoch=10)
        assert np.isclose(float(sched(0)), 2e-4)
        assert np.isclose(float(sched(599)), 2e-4)
        assert np.isclose(float(sched(600)), 2e-5)
        assert np.isclose(float(sched(900)), 2e-6)

    def test_clip_inf_norm(self):
        grads = {
            "encoder": {"w": jnp.asarray([100.0, -200.0])},
            "decoder": {"w": jnp.asarray([100.0])},
            "vgg": {"w": jnp.asarray([5.0])},
        }
        out = clip_inf_norm_subtrees(grads, 10.0)
        # encoder scaled to inf-norm 10
        np.testing.assert_allclose(
            np.asarray(out["encoder"]["w"]), [5.0, -10.0], rtol=1e-4
        )
        # decoder NOT in the clip set
        np.testing.assert_allclose(np.asarray(out["decoder"]["w"]), [100.0])


class TestResume:
    def test_restore_train_state_roundtrip(self, tmp_path):
        """Kill-and-resume preserves Adam moments, LR-schedule position,
        step counter, and epoch (beats /root/reference/train.py:27-32,
        which restarts the optimizer)."""
        import optax

        from mrfa_tpu.train.loop import restore_train_state
        from mrfa_tpu.utils.checkpoint import save_checkpoint

        params = {
            "encoder": {"w": jnp.ones((3, 3))},
            "decoder": {"w": jnp.ones((2,))},
            "dense_motion": {"w": jnp.ones((2,))},
            "bg_predictor": {"w": jnp.ones((2,))},
            "vgg": {"w": jnp.ones((2,))},
        }
        tx_main = make_optimizer(params, 2e-4, [60, 90], 10, MAIN_SUBTREES)
        tx_bg = make_optimizer(params, 2e-4, [60, 90], 10, BG_SUBTREES)
        state = create_train_state(
            {"params": params, "batch_stats": {"bn": jnp.zeros((2,))}},
            tx_main, tx_bg,
        )
        # take 3 optimizer steps so Adam moments + schedule counts are nonzero
        grads = jax.tree.map(jnp.ones_like, params)
        for _ in range(3):
            upd, om = tx_main.update(grads, state.opt_state_main, state.params)
            p = optax.apply_updates(state.params, upd)
            upd, ob = tx_bg.update(grads, state.opt_state_bg, p)
            p = optax.apply_updates(p, upd)
            state = state.replace(
                step=state.step + 1, params=p,
                opt_state_main=om, opt_state_bg=ob,
            )

        save_checkpoint(
            str(tmp_path / "ckpt"),
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state_main": state.opt_state_main,
                "opt_state_bg": state.opt_state_bg,
                "epoch": 7,
                "step": int(state.step),
            },
            step=7,
        )

        fresh = create_train_state(
            {"params": jax.tree.map(jnp.zeros_like, params),
             "batch_stats": {"bn": jnp.ones((2,))}},
            tx_main, tx_bg,
        )
        resumed, start_epoch = restore_train_state(str(tmp_path / "ckpt"), fresh)
        assert start_epoch == 8
        assert int(resumed.step) == 3
        for got, want in zip(
            jax.tree.leaves((resumed.params, resumed.batch_stats,
                             resumed.opt_state_main, resumed.opt_state_bg)),
            jax.tree.leaves((state.params, state.batch_stats,
                             state.opt_state_main, state.opt_state_bg)),
        ):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = small_cfg("fomm")
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
        return cfg, model, variables

    def test_sharded_train_step(self, setup):
        cfg, model, variables = setup
        tp = cfg["train_params"]
        tx_main = make_optimizer(variables["params"], tp["lr"], tp["epoch_milestones"], 10, MAIN_SUBTREES)
        tx_bg = make_optimizer(variables["params"], tp["lr"], tp["epoch_milestones"], 10, BG_SUBTREES)

        mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
        with mesh:
            state = create_train_state(variables, tx_main, tx_bg)
            step = make_train_step(
                model, tx_main, tx_bg, use_bg=True, dropout_flag=False,
                clip_grad=True, clip=10.0, donate=False,
            )
            rng = np.random.RandomState(0)
            batch = shard_batch(
                {
                    "source": jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32),
                    "driving": jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32),
                },
                mesh,
            )
            new_state, metrics, extras = step(
                state, batch, jax.random.PRNGKey(7), jnp.float32(0.0)
            )
            loss = float(metrics["loss"])
            assert np.isfinite(loss), metrics
            assert int(new_state.step) == 1

            # main params updated
            old = variables["params"]["encoder"]
            new = new_state.params["encoder"]
            diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), old, new)
            assert max(jax.tree.leaves(diffs)) > 0

            # frozen vgg untouched
            oldv = variables["params"]["vgg"]
            newv = new_state.params["vgg"]
            diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), oldv, newv)
            assert max(jax.tree.leaves(diffs)) == 0

            # bg predictor updated (use_bg=True)
            oldb = variables["params"]["bg_predictor"]
            newb = new_state.params["bg_predictor"]
            diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), oldb, newb)
            assert max(jax.tree.leaves(diffs)) > 0

            # batch stats changed (train-mode BN)
            bs_old = jax.tree.leaves(variables["batch_stats"])
            bs_new = jax.tree.leaves(new_state.batch_stats)
            assert any(
                float(jnp.abs(a - b).max()) > 0 for a, b in zip(bs_old, bs_new)
            )


class TestRematGradients:
    def test_remat_lean_grads_match_plain(self):
        """train_params.remat=True flips on per-iteration remat + the lean
        warp gather (ops/sampler.py). Identical math: the composite loss
        gradient must match the plain (remat=False) graph."""
        import jax

        def grads_for(remat):
            cfg = small_cfg("fomm")
            cfg["train_params"]["remat"] = remat
            model = MRFA(cfg)
            rng = np.random.RandomState(0)
            src = jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32)
            drv = jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32)
            rngs = {
                "params": jax.random.PRNGKey(0),
                "equivariance": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
            }
            variables = model.init(
                rngs, src, drv, train=True, compute_loss=True, use_bg=True
            )

            def loss_fn(params):
                (_, _, losses, _, _), _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    src, drv, train=True, compute_loss=True, use_bg=True,
                    rngs=rngs, mutable=["batch_stats"],
                )
                return sum(jnp.mean(v) for v in losses.values())

            return jax.grad(loss_fn)(variables["params"])

        g0 = grads_for(False)
        g1 = grads_for(True)
        for p0, (a0, a1) in jax.tree_util.tree_leaves_with_path(
            jax.tree.map(lambda a, b: (np.asarray(a), np.asarray(b)), g0, g1),
            is_leaf=lambda x: isinstance(x, tuple),
        ):
            np.testing.assert_allclose(a0, a1, atol=2e-4, err_msg=str(p0))
