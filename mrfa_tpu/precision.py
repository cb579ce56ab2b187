"""Selective mixed precision policy.

All-bf16 inference is fast but wrong for this model: flows/coordinates at
256-px scale lose ~1 px to bf16's 8-bit mantissa (measured 0.15 mean abs
output error). The policy here keeps the *geometry stream* (coordinate grids,
flows, gaussians, resize weights, sampling coords) in f32 and runs the conv/
matmul compute in bf16 — flow deltas re-promote to f32 on accumulation.

Usage (affects subsequently traced modules; trace-time global):
    from mrfa_tpu import precision
    precision.set_compute_dtype(jnp.bfloat16)
"""
from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = None  # None = full f32 (parity default)


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


# param paths that deliberately run f32 regardless of the compute policy
# (geometry heads; see the module docstring). Matched against any path
# component of the flattened variables tree.
_F32_PARAM_NAMES = frozenset(
    {"fc", "jacobian", "mlp_head_jacobian_1", "pos_embedding", "keypoint_token"}
)


def cast_params_for_inference(variables, dtype=jnp.bfloat16):
    """Pre-cast the compute-dtype parameter leaves to `dtype` ONCE.

    Under the bf16 compute policy every conv/dense built by nn/blocks.py
    casts its f32 kernel to bf16 *inside the traced program, every call* —
    the serving frame profile shows those casts as per-frame f32 weight
    reads + relayout copy chains (~113 MB/frame at 256px). Casting the same
    leaves ahead of time is bit-identical (the call-time cast becomes a
    no-op) and moves the traffic out of the frame loop.

    Only leaves flax would cast anyway are touched: float32 params of
    ndim >= 2 (conv/dense kernels) outside the deliberate-f32 geometry
    heads. Biases, norm scales (ndim 1), batch_stats, and the f32 heads
    stay f32. Inference only — the optimizer must keep f32 masters.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        cast = (
            path[0] == "params"
            and getattr(leaf, "ndim", 0) >= 2
            and getattr(leaf, "dtype", None) == jnp.float32
            and not (_F32_PARAM_NAMES & set(path))
        )
        out[path] = leaf.astype(dtype) if cast else leaf
    return unflatten_dict(out)
