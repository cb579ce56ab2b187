"""HRNet-W32 feature trunk for the MTIA keypoint encoder.

Behavioral spec re-derived from /root/reference/modules/transformer/hr_base.py:
294-450 (stem stride 4, one Bottleneck stage, 2- and 3-branch BASIC stages
with exchange/fusion units, final single 32-channel 64x64 output). Submodule
names mirror the torch attribute paths for mechanical weight conversion.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import conv2d
from mrfa_tpu.nn.norm import BatchNorm
from mrfa_tpu.ops.resize import upsample_nearest


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, padding=1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        if self.use_downsample:
            residual = conv2d(self.planes, 1, stride=self.stride, use_bias=False, name="downsample_0")(x)
            residual = BatchNorm(self.planes, name="downsample_1")(residual, train)
        return jax.nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = conv2d(self.planes, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(self.planes, name="bn1")(out, train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.planes, name="bn2")(out, train)
        out = jax.nn.relu(out)
        out = conv2d(self.planes * self.expansion, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(self.planes * self.expansion, name="bn3")(out, train)
        if self.use_downsample:
            residual = conv2d(self.planes * self.expansion, 1, stride=self.stride, use_bias=False, name="downsample_0")(x)
            residual = BatchNorm(self.planes * self.expansion, name="downsample_1")(residual, train)
        return jax.nn.relu(out + residual)


class HighResolutionModule(nn.Module):
    """Parallel branches of BasicBlocks followed by full exchange fusion."""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        xs = list(xs)
        for i in range(self.num_branches):
            x = xs[i]
            for bidx in range(self.num_blocks[i]):
                x = BasicBlock(self.num_channels[i], name=f"branches_{i}_{bidx}")(x, train)
            xs[i] = x

        if self.num_branches == 1:
            return xs

        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            y = None
            for j in range(self.num_branches):
                if j == i:
                    t = xs[j]
                elif j > i:
                    # 1x1 conv + BN + nearest upsample 2^(j-i)
                    t = conv2d(
                        self.num_channels[i], 1, use_bias=False,
                        name=f"fuse_layers_{i}_{j}_0",
                    )(xs[j])
                    t = BatchNorm(
                        self.num_channels[i], name=f"fuse_layers_{i}_{j}_1"
                    )(t, train)
                    t = upsample_nearest(t, 2 ** (j - i))
                else:  # j < i: (i-j) stride-2 3x3 conv steps
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        t = conv2d(
                            ch, 3, stride=2, padding=1, use_bias=False,
                            name=f"fuse_layers_{i}_{j}_{k}_0",
                        )(t)
                        t = BatchNorm(ch, name=f"fuse_layers_{i}_{j}_{k}_1")(t, train)
                        if not last:
                            t = jax.nn.relu(t)
                y = t if y is None else y + t
            fused.append(jax.nn.relu(y))
        return fused


class HRNetBase(nn.Module):
    """HRNet trunk: stem(/4) -> bottleneck stage -> 2-branch -> 3-branch."""

    stage2_num_modules: int = 1
    stage2_num_blocks: Sequence[int] = (4, 4)
    stage2_num_channels: Sequence[int] = (32, 64)
    stage3_num_modules: int = 4
    stage3_num_blocks: Sequence[int] = (4, 4, 4)
    stage3_num_channels: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool) -> jnp.ndarray:
        # stem: two stride-2 3x3 convs
        x = conv2d(64, 3, stride=2, padding=1, use_bias=False, name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, train)
        x = jax.nn.relu(x)
        x = conv2d(64, 3, stride=2, padding=1, use_bias=False, name="conv2")(x)
        x = BatchNorm(64, name="bn2")(x, train)
        x = jax.nn.relu(x)

        # layer1: 4 bottlenecks at 64 planes (output 256 channels)
        for bidx in range(4):
            x = Bottleneck(64, use_downsample=(bidx == 0), name=f"layer1_{bidx}")(x, train)

        # transition1: 256 -> (32, 64/2x-down)
        c2 = list(self.stage2_num_channels)
        x0 = conv2d(c2[0], 3, padding=1, use_bias=False, name="transition1_0_0")(x)
        x0 = BatchNorm(c2[0], name="transition1_0_1")(x0, train)
        x0 = jax.nn.relu(x0)
        x1 = conv2d(c2[1], 3, stride=2, padding=1, use_bias=False, name="transition1_1_0_0")(x)
        x1 = BatchNorm(c2[1], name="transition1_1_0_1")(x1, train)
        x1 = jax.nn.relu(x1)
        xs = [x0, x1]

        for m in range(self.stage2_num_modules):
            xs = HighResolutionModule(
                2, self.stage2_num_blocks, c2, multi_scale_output=True,
                name=f"stage2_{m}",
            )(xs, train)

        # transition2: add a third (4x-down) branch from the last stage-2 branch
        c3 = list(self.stage3_num_channels)
        x2 = conv2d(c3[2], 3, stride=2, padding=1, use_bias=False, name="transition2_2_0_0")(xs[-1])
        x2 = BatchNorm(c3[2], name="transition2_2_0_1")(x2, train)
        x2 = jax.nn.relu(x2)
        xs = [xs[0], xs[1], x2]

        for m in range(self.stage3_num_modules):
            last = m == self.stage3_num_modules - 1
            xs = HighResolutionModule(
                3, self.stage3_num_blocks, c3, multi_scale_output=not last,
                name=f"stage3_{m}",
            )(xs, train)
        return xs[0]  # (B, H/4, W/4, 32)
