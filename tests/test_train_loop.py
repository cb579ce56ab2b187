"""End-to-end train() driver tests: epoch loop, logging, checkpoint cadence,
kill-and-resume, and the TPSM dropout train phase — tiny synthetic data, CPU.

Covers /root/reference/train.py:17-94 semantics at the driver level (the
jitted step itself is covered by test_train.py)."""
import copy
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_e2e import synthetic_root  # noqa: F401 (fixture)
from tests.test_train import SIZE, small_cfg

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow


def loop_cfg(prior="fomm"):
    cfg = small_cfg(prior)
    tp = cfg["train_params"]
    tp["num_epochs"] = 2
    tp["checkpoint_freq"] = 1
    tp["num_repeats"] = 1
    # prior_only skips the 6-scale refinement loop: the driver-level
    # behavior under test is identical and the CPU compile stays small
    cfg["raft_flow"]["prior_only"] = True
    cfg["visualizer_params"] = {"draw_border": True, "colormap": "gist_rainbow"}
    if prior == "tpsm":
        tp.update(
            dropout_epoch=2, dropout_maxp=0.3, dropout_startp=0.1,
            dropout_inc_epoch=10,
        )
    return cfg


class TestTrainDriver:
    def test_train_and_resume(self, synthetic_root, tmp_path):  # noqa: F811
        from mrfa_tpu.data.dataset import FramesDataset
        from mrfa_tpu.models.mrfa import MRFA
        from mrfa_tpu.train.loop import train

        cfg = loop_cfg("fomm")
        model = MRFA(cfg)
        ds = FramesDataset(
            synthetic_root, frame_shape=(SIZE, SIZE, 3), is_train=True
        )
        log_dir = str(tmp_path / "run")
        os.makedirs(log_dir)

        state = train(
            cfg, model, None, log_dir, ds, seed=0, max_steps_per_epoch=1
        )
        assert int(state.step) == 2  # 2 epochs x 1 step
        assert os.path.exists(os.path.join(log_dir, "log.txt"))
        # checkpoint_freq=1 -> a snapshot for every epoch
        ckpts = sorted(os.listdir(os.path.join(log_dir, "ckpt")))
        assert ckpts == ["0", "1"], ckpts

        # resume from the epoch-1 snapshot and extend to 3 epochs: exactly
        # one more step runs and the step counter continues (true resume —
        # the reference restarts its optimizer, train.py:27-32 there)
        cfg3 = copy.deepcopy(cfg)
        cfg3["train_params"]["num_epochs"] = 3
        model3 = MRFA(cfg3)
        state3 = train(
            cfg3, model3, os.path.join(log_dir, "ckpt"), log_dir, ds,
            seed=0, max_steps_per_epoch=1,
        )
        assert int(state3.step) == 3
        assert sorted(os.listdir(os.path.join(log_dir, "ckpt"))) == ["0", "1", "2"]

    def test_tpsm_dropout_train_step(self):
        """TPSM prior trains with the dropout_softmax phase active
        (reference model.py:194-200 + dense_motion.py dropout path)."""
        from mrfa_tpu.models.mrfa import MRFA
        from mrfa_tpu.train.optim import (
            BG_SUBTREES, MAIN_SUBTREES, make_optimizer,
        )
        from mrfa_tpu.train.trainer import create_train_state, make_train_step

        cfg = loop_cfg("tpsm")
        model = MRFA(cfg)
        dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "equivariance": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        }
        variables = model.init(
            rngs, dummy, dummy, train=True, compute_loss=True, use_bg=True,
            dropout_flag=True, dropout_p=0.1,
        )
        tp = cfg["train_params"]
        tx_main = make_optimizer(
            variables["params"], tp["lr"], tp["epoch_milestones"], 10,
            MAIN_SUBTREES,
        )
        tx_bg = make_optimizer(
            variables["params"], tp["lr"], tp["epoch_milestones"], 10,
            BG_SUBTREES,
        )
        state = create_train_state(variables, tx_main, tx_bg)
        step = make_train_step(
            model, tx_main, tx_bg, use_bg=True, dropout_flag=True,
            clip_grad=True, clip=10.0, donate=False,
        )
        rng = np.random.RandomState(0)
        batch = {
            "source": jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32),
            "driving": jnp.asarray(rng.rand(2, SIZE, SIZE, 3), jnp.float32),
        }
        new_state, metrics, _ = step(
            state, batch, jax.random.PRNGKey(7), jnp.float32(0.15)
        )
        assert np.isfinite(float(metrics["loss"])), metrics
        # tpsm has no jacobian -> no jacobian-equivariance loss term
        assert "equivariance_jacobian" not in metrics
        # encoder (ResNet-18 TPS kp) updated
        old = jax.tree.leaves(variables["params"]["encoder"])[0]
        new = jax.tree.leaves(new_state.params["encoder"])[0]
        assert float(jnp.abs(new - old).max()) > 0
