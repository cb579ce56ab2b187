"""Conv blocks and Hourglass (L0 building blocks), NHWC flax modules.

Semantic parity targets: the conv blocks of /root/reference/modules/util.py:
111-278 (SameBlock2d / DownBlock2d / UpBlock2d / ResBlock2d / ChannelBlock2d /
Encoder / Decoder / Hourglass). Submodule names mirror the torch attribute
paths so the mechanical checkpoint converter maps state dicts 1:1.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrfa_tpu.nn.norm import BatchNorm
from mrfa_tpu.ops.resize import avg_pool, upsample_nearest


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch Conv2d/Linear default."""
    fan_in = int(np.prod(shape[:-1]))  # HWIO: h*w*in
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d(
    features,
    kernel_size,
    stride=1,
    padding=0,
    groups=1,
    use_bias=True,
    name=None,
):
    """Bare nn.Conv with torch init — used where torch has a raw Conv2d.

    Unlike `Conv` (a wrapper submodule), this attaches parameters directly at
    `name`, matching torch's `<name>.weight` / `<name>.bias` paths.
    """
    from mrfa_tpu.precision import get_compute_dtype

    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return nn.Conv(
        features=features,
        kernel_size=ks,
        strides=(stride, stride),
        padding=pad,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        dtype=get_compute_dtype(),
        name=name,
    )


def dense(features, use_bias=True, name=None):
    from mrfa_tpu.precision import get_compute_dtype

    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        dtype=get_compute_dtype(),
        name=name,
    )


class SameBlock2d(nn.Module):
    """conv -> BN -> relu, preserving resolution."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        return jax.nn.relu(x)


class DownBlock2d(nn.Module):
    """conv -> BN -> relu -> 2x avg-pool."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        x = jax.nn.relu(x)
        return avg_pool(x, 2)


class UpBlock2d(nn.Module):
    """2x nearest upsample -> conv -> BN -> relu."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = upsample_nearest(x, 2)
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        return jax.nn.relu(x)


class ResBlock2d(nn.Module):
    """Pre-activation residual block preserving channels and resolution."""

    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm(self.features, name="norm1")(x, train)
        out = jax.nn.relu(out)
        out = conv2d(self.features, self.kernel_size, padding=self.padding, name="conv1")(out)
        out = BatchNorm(self.features, name="norm2")(out, train)
        out = jax.nn.relu(out)
        out = conv2d(self.features, self.kernel_size, padding=self.padding, name="conv2")(out)
        return out + x


class ChannelBlock2d(nn.Module):
    """BN -> relu -> conv halving the channel count."""

    in_features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm(self.in_features, name="norm1")(x, train)
        out = jax.nn.relu(out)
        return conv2d(
            self.in_features // 2, self.kernel_size, padding=self.padding, name="conv1"
        )(out)


class Encoder(nn.Module):
    """Hourglass encoder: num_blocks DownBlocks, doubling channels to a cap."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        outs = [x]
        for i in range(self.num_blocks):
            out_feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            blk = DownBlock2d(out_feats, kernel_size=3, padding=1, name=f"down_blocks_{i}")
            outs.append(blk(outs[-1], train))
        return outs


class Decoder(nn.Module):
    """Hourglass decoder with skip concat; out channels = expansion + input."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, feats, train: bool):
        feats = list(feats)
        out = feats.pop()
        for idx, i in enumerate(reversed(range(self.num_blocks))):
            out_feats = min(self.max_features, self.block_expansion * (2**i))
            blk = UpBlock2d(out_feats, kernel_size=3, padding=1, name=f"up_blocks_{idx}")
            out = blk(out, train)
            skip = feats.pop()
            out = jnp.concatenate([out, skip], axis=-1)
        return out


def hourglass_out_filters(block_expansion: int, in_features: int) -> int:
    return block_expansion + in_features


class Hourglass(nn.Module):
    """U-Net with skip concatenation (encoder + decoder)."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, x, train: bool):
        feats = Encoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="encoder",
        )(x, train)
        return Decoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder",
        )(feats, train)
