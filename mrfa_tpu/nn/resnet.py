"""ResNet-18 (torchvision-compatible structure and naming) in flax/NHWC.

Used by the TPSM keypoint detector and the background motion predictor
(/root/reference/modules/kp_detector.py:136-158, bg_motion_predictor.py:5-24).
Submodule names mirror the torchvision state_dict so converted torch weights
drop straight in (conv1, bn1, layer{1..4}.{0,1}.conv{1,2}/bn{1,2}/downsample).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import conv2d, dense
from mrfa_tpu.nn.norm import BatchNorm


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max pool, stride 2, padding 1 (the torchvision stem pool)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


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
            residual = conv2d(
                self.planes, 1, stride=self.stride, use_bias=False, name="downsample_0"
            )(x)
            residual = BatchNorm(self.planes, name="downsample_1")(residual, train)
        return jax.nn.relu(out + residual)


class ResNet18(nn.Module):
    """ResNet-18 trunk + global average pool + fc head."""

    num_outputs: int = 1000
    in_channels: int = 3
    fc_kernel_init: nn.initializers.Initializer | None = None
    fc_bias_init: nn.initializers.Initializer | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = BatchNorm(64, name="bn1")(x, train)
        x = jax.nn.relu(x)
        x = max_pool_3x3_s2(x)
        for layer_idx, planes in enumerate([64, 128, 256, 512], start=1):
            for block_idx in range(2):
                stride = 2 if (layer_idx > 1 and block_idx == 0) else 1
                need_ds = stride != 1
                x = BasicBlock(
                    planes,
                    stride=stride,
                    use_downsample=need_ds,
                    name=f"layer{layer_idx}_{block_idx}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        fc = nn.Dense(
            self.num_outputs,
            kernel_init=self.fc_kernel_init or nn.initializers.lecun_normal(),
            bias_init=self.fc_bias_init or nn.initializers.zeros,
            name="fc",
        )
        return fc(x)
