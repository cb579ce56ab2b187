"""Device mesh + sharding helpers (the TPU-native replacement for DDP/NCCL).

The reference scales with torch DDP over NCCL (/root/reference/run.py:51,
train.py:43-48): data parallelism only, gradient allreduce, SyncBatchNorm,
loss reduce-to-rank0. Here the same program is expressed once and partitioned
by GSPMD: the batch axis is sharded over the 'data' mesh axis, parameters are
replicated, and every cross-replica reduction (grad psum, BN stats, loss
means) is an XLA collective over ICI inserted by the partitioner.

A second 'model' axis is provisioned for sharding the correlation volume /
attention heads (sequence/tensor parallelism) on larger footprints.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def constrain_batch(tree: Any) -> Any:
    """Inside jit: constrain activations to stay batch-sharded."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, P(DATA_AXIS)), tree
    )
