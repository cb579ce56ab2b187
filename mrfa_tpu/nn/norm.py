"""BatchNorm with exact torch semantics (and free cross-replica sync).

Matches torch.nn.BatchNorm2d behavior:
  - eps 1e-5, momentum 0.1 (running = (1-m)*running + m*batch),
  - normalization uses the *biased* batch variance,
  - the running-var update uses the *unbiased* batch variance.

Cross-replica synchronization (the reference wraps everything in
torch.nn.SyncBatchNorm for DDP, /root/reference/train.py:43): under
`jit` with the batch axis sharded over the mesh, `jnp.mean` over the batch
is a global reduction — XLA inserts the collective — so this layer is a
SyncBatchNorm automatically. No axis_name plumbing needed for the pjit path;
`axis_name` is accepted for use under shard_map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            cdt = jnp.promote_types(x.dtype, jnp.float32)
            xc = x.astype(cdt)
            mean = jnp.mean(xc, axis=reduce_axes)
            mean2 = jnp.mean(xc * xc, axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            n = x.size // x.shape[-1]
            if self.axis_name is not None:
                n = n * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
            use_mean, use_var = mean, var
        else:
            use_mean, use_var = ra_mean.value, ra_var.value

        y = (x - use_mean) * jax.lax.rsqrt(use_var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch parameter naming (scale/bias)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias
