"""Keypoint detectors: FOMM hourglass detector and TPSM ResNet detector.

Semantics match /root/reference/modules/kp_detector.py:17-158: anti-aliased
0.25x downsample, hourglass, 7x7 valid conv to K heatmaps, temperature
softmax over space, soft-argmax against the [-1,1] grid; optional jacobian
head initialized to identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrfa_tpu.nn.blocks import Hourglass, conv2d
from mrfa_tpu.nn.resnet import ResNet18
from mrfa_tpu.ops.grid import make_coordinate_grid
from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample


def gaussian2kp(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax: (B, h, w, K) normalized heatmaps -> (B, K, 2) in [-1,1]."""
    b, h, w, k = heatmap.shape
    grid = make_coordinate_grid(h, w, dtype=heatmap.dtype)  # (h, w, 2)
    kp = jnp.einsum("bhwk,hwc->bkc", heatmap, grid)
    return kp


class KPDetector(nn.Module):
    """FOMM prior keypoint detector (hourglass + soft-argmax [+ jacobian])."""

    block_expansion: int = 32
    num_kp: int = 10
    num_channels: int = 3
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    scale_factor: float = 0.25
    estimate_jacobian: bool = False
    estimate_occlusion: bool = False

    def setup(self):
        self.predictor = Hourglass(
            self.block_expansion,
            in_features=self.num_channels,
            max_features=self.max_features,
            num_blocks=self.num_blocks,
            name="predictor",
        )
        self.kp = conv2d(self.num_kp, 7, padding=0, name="kp")
        if self.estimate_jacobian:
            # 4-channel head initialized to the identity jacobian
            self.jacobian = nn.Conv(
                features=4,
                kernel_size=(7, 7),
                padding=((0, 0), (0, 0)),
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.array(
                    [1.0, 0.0, 0.0, 1.0], dtype=dtype
                ),
                name="jacobian",
            )
        if self.estimate_occlusion:
            # per-keypoint visibility head (present in the reference API,
            # unused by the released configs)
            from mrfa_tpu.nn.blocks import DownBlock2d

            be = self.block_expansion
            self.kp_occlusion_blocks = [
                DownBlock2d(be, name="kp_occlusion_0"),
                DownBlock2d(be * 2, name="kp_occlusion_1"),
                DownBlock2d(be * 3, name="kp_occlusion_2"),
                DownBlock2d(be * 4, name="kp_occlusion_3"),
            ]
            self.kp_occlusion_final = conv2d(
                self.num_kp, 4, stride=4, padding=0, name="kp_occlusion_4"
            )
        self._aa = AntiAliasParams.create(self.scale_factor)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.scale_factor != 1:
            x = antialias_downsample(x, self._aa)
        feature_map = self.predictor(x, train)
        prediction = self.kp(feature_map)  # (B, h', w', K)
        b, h, w, k = prediction.shape
        heatmap = jax.nn.softmax(
            prediction.reshape(b, h * w, k) / self.temperature, axis=1
        ).reshape(b, h, w, k)
        out = {"kp": gaussian2kp(heatmap)}
        if self.estimate_jacobian:
            jacobian_map = self.jacobian(feature_map)  # (B, h', w', 4)
            jac = jnp.einsum("bhwk,bhwc->bkc", heatmap, jacobian_map)
            out["jacobian"] = jac.reshape(b, k, 2, 2)
        if self.estimate_occlusion:
            occ = feature_map
            for blk in self.kp_occlusion_blocks:
                occ = blk(occ, train)
            occ = self.kp_occlusion_final(occ)
            out["kp_occlusion"] = jax.nn.sigmoid(occ)
        return out


class TPSKPDetector(nn.Module):
    """TPSM prior: ResNet-18 regressing K*5 keypoints in [-1, 1]."""

    num_tps: int = 10

    def setup(self):
        self.fg_encoder = ResNet18(
            num_outputs=self.num_tps * 5 * 2, name="fg_encoder"
        )

    def __call__(self, image: jnp.ndarray, train: bool = False):
        fg_kp = self.fg_encoder(image, train)
        bs = fg_kp.shape[0]
        fg_kp = jax.nn.sigmoid(fg_kp) * 2.0 - 1.0
        return {"kp": fg_kp.reshape(bs, self.num_tps * 5, 2)}
