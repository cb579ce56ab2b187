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


def maybe_constrain(x, *spec):
    """with_sharding_constraint(x, P(*spec)) iff the ambient mesh has the axes.

    Lets model code annotate sequence/tensor shardings (e.g. the correlation
    volume over the 'model' axis) without breaking single-mesh-axis or
    no-mesh traces.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        axes = set(getattr(mesh, "axis_names", ()) or ())
    except Exception:
        return x
    needed = {s for s in spec if s is not None}
    if not needed or not needed.issubset(axes):
        return x
    sizes = dict(zip(mesh.axis_names, mesh.axis_sizes))
    # skip degenerate single-slice axes (constraint would be a no-op)
    if all(sizes.get(s, 1) == 1 for s in needed):
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))
