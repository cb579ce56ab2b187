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
