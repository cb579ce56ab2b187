"""Model-axis ('data','model') mesh coverage — VERDICT round-1 item 5.

The correlation-volume / sequence sharding annotations
(models/raft.py maybe_constrain calls, parallel/mesh.py:63) previously had no
green test on a model-axis>1 mesh. GSPMD partitioning is semantics-preserving,
so the sharded forward/train-step must match the single-device result up to
float reassociation; these tests pin that.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.parallel.mesh import make_mesh, shard_batch
from mrfa_tpu.train.optim import BG_SUBTREES, MAIN_SUBTREES, make_optimizer
from mrfa_tpu.train.trainer import create_train_state, make_train_step

from tests.test_train import SIZE, small_cfg

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow

BATCH = 4


# fomm = round-1 coverage; mtia (reduced depth 2) = the flagship prior's
# HRNet + patchify + attention reshapes on a model-axis mesh (VERDICT r2
# item 3: these are exactly the ops GSPMD can mis-partition silently)
@pytest.fixture(scope="module", params=["fomm", "mtia"])
def setup(request):
    cfg = small_cfg(request.param)
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
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    driving = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    return cfg, model, variables, source, driving


def _eval_forward(model, variables, source, driving):
    fn = jax.jit(
        lambda v, s, d: model.apply(v, s, d, train=False)[0]
    )
    return np.asarray(fn(variables, source, driving))


class TestModelAxisForward:
    def test_2x2_mesh_matches_single_device(self, setup):
        cfg, model, variables, source, driving = setup
        want = _eval_forward(model, variables, source, driving)

        mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
        with jax.sharding.set_mesh(mesh):
            batch = shard_batch({"s": source, "d": driving}, mesh)
            got = _eval_forward(model, variables, batch["s"], batch["d"])
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestModelAxisTrainStep:
    def _one_step(self, cfg, model, variables, source, driving, mesh=None):
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
            model, tx_main, tx_bg, use_bg=True, dropout_flag=False,
            clip_grad=True, clip=10.0, donate=False,
        )
        batch = {"source": source, "driving": driving}
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        new_state, metrics, _ = step(
            state, batch, jax.random.PRNGKey(7), jnp.float32(0.0)
        )
        return new_state, metrics

    def test_4x2_mesh_step_matches_single_device(self, setup):
        cfg, model, variables, source, driving = setup

        ref_state, ref_metrics = self._one_step(
            cfg, model, variables, source, driving
        )
        ref_loss = float(ref_metrics["loss"])
        ref_leaves = jax.tree.leaves(
            jax.device_get((ref_state.params, ref_state.batch_stats))
        )

        mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
        with jax.sharding.set_mesh(mesh):
            state, metrics = self._one_step(
                cfg, model, variables, source, driving, mesh=mesh
            )
            loss = float(metrics["loss"])
            leaves = jax.tree.leaves(
                jax.device_get((state.params, state.batch_stats))
            )

        np.testing.assert_allclose(loss, ref_loss, rtol=1e-4)
        assert len(leaves) == len(ref_leaves)
        # post-Adam params: a reassociation-level grad difference can flip
        # the sign of a near-zero gradient, moving that element by a full
        # Adam step (~lr * m/sqrt(v), bounded by ~2*lr = 4e-4 at warmup), so
        # the meaningful bound is absolute, just above 2*lr
        for got, want in zip(leaves, ref_leaves):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=5e-4, rtol=0
            )
