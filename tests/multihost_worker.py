"""Worker process for the multi-host (jax.distributed) train-step test.

Launched as: python tests/multihost_worker.py <proc_id> <nproc> <port> <out.json>

Each process owns 2 virtual CPU devices; jax.distributed.initialize stitches
them into one 2*nproc-device global topology (the CPU-backend analogue of
one host per slice). One GSPMD-sharded train step runs on a global mesh with
the global batch assembled from per-process local rows — the semantics the
reference gets from torchrun + DDP (/root/reference/run.py:48-59: world-size
batch split, NCCL allreduce).

Writes {loss, n_devices, n_local, param_digest} as JSON for the pytest
assertions (loss must be finite, identical across processes, and equal to a
single-process run of the same global batch).
"""
import json
import os
import sys

proc_id, nproc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon sitecustomize overrides jax_platforms at interpreter start; the
# config update (not the env var) is what actually forces CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_train import SIZE, small_cfg  # noqa: E402
from mrfa_tpu.models.mrfa import MRFA  # noqa: E402
from mrfa_tpu.parallel.mesh import batch_sharding, make_mesh  # noqa: E402
from mrfa_tpu.train.optim import (  # noqa: E402
    BG_SUBTREES, MAIN_SUBTREES, make_optimizer,
)
from mrfa_tpu.train.trainer import (  # noqa: E402
    create_train_state, make_train_step,
)


def main():
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    cfg = small_cfg("fomm")
    cfg["raft_flow"]["prior_only"] = True  # driver semantics, small compile
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
    tp = cfg["train_params"]
    tx_main = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], 10, MAIN_SUBTREES
    )
    tx_bg = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], 10, BG_SUBTREES
    )

    mesh = make_mesh()  # (4, 1): data axis over the global device topology
    global_batch = 4
    rows_per_proc = global_batch // nproc
    # deterministic global batch; each process materializes only its rows
    # (the per-host data split of run.py:59 in the reference)
    rng = np.random.RandomState(42)
    src_g = rng.rand(global_batch, SIZE, SIZE, 3).astype(np.float32)
    drv_g = rng.rand(global_batch, SIZE, SIZE, 3).astype(np.float32)
    lo = proc_id * rows_per_proc
    sharding = batch_sharding(mesh)
    batch = {
        "source": jax.make_array_from_process_local_data(
            sharding, src_g[lo : lo + rows_per_proc], src_g.shape
        ),
        "driving": jax.make_array_from_process_local_data(
            sharding, drv_g[lo : lo + rows_per_proc], drv_g.shape
        ),
    }

    with jax.sharding.set_mesh(mesh), mesh:
        state = create_train_state(variables, tx_main, tx_bg)
        step_fn = make_train_step(
            model, tx_main, tx_bg, use_bg=True, dropout_flag=False,
            clip_grad=True, clip=10.0, donate=False,
        )
        state, metrics, _ = step_fn(
            state, batch, jax.random.PRNGKey(7), jnp.float32(0.0)
        )
        loss = float(metrics["loss"])
        # digest of the post-step params: must be identical across processes
        # (the GSPMD grad psum is the DDP allreduce equivalent)
        digest = float(
            sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(state.params))
        )

    with open(out_path, "w") as f:
        json.dump(
            {
                "loss": loss,
                "digest": digest,
                "n_devices": jax.device_count(),
                "n_local": jax.local_device_count(),
                "process_index": jax.process_index(),
            },
            f,
        )


if __name__ == "__main__":
    main()
