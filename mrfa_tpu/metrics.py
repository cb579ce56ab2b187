"""Evaluation metrics: L1, PSNR, LPIPS.

Matches the reconstruction harness metrics of /root/reference/
reconstruction.py:13-19,68-70. LPIPS uses the standard VGG16-feature
formulation; the learned per-channel linear weights require a converted
`lpips` checkpoint — when absent, a documented uniform-weight fallback is
used (distances remain comparable across runs of this framework; for
cross-paper numbers convert the official weights via
utils/torch_convert.convert_state_dict).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import conv2d
from mrfa_tpu.nn.vgg import IMAGENET_MEAN, IMAGENET_STD, _max_pool2


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray, pixel_max: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(pixel_max / jnp.sqrt(mse))


# VGG16 conv indices per block (torchvision .features): relu1_2 .. relu5_3
_VGG16_SLICES = [
    [(0, 64), (2, 64)],
    [(5, 128), (7, 128)],
    [(10, 256), (12, 256), (14, 256)],
    [(17, 512), (19, 512), (21, 512)],
    [(24, 512), (26, 512), (28, 512)],
]
_VGG16_POOL_AFTER = {4, 9, 16, 23}


class LpipsVgg(nn.Module):
    """LPIPS(net='vgg'): unit-normalized VGG16 features, per-channel weights.

    `normalize=False` (default) matches the reference harness exactly: it
    feeds [0,1] images straight into lpips's scaling layer, which expects
    [-1,1] (/root/reference/reconstruction.py:69 passes raw tensors with the
    lpips default normalize=False). `normalize=True` is the image-correct
    variant (maps [0,1] -> [-1,1] first, lpips's own `normalize=True`).
    """

    use_linear_weights: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray([-0.030, -0.088, -0.188])
        scale = jnp.asarray([0.458, 0.448, 0.450])

        convs = {
            idx: conv2d(ch, 3, padding=1, name=f"features_{idx}")
            for slice_convs in _VGG16_SLICES
            for idx, ch in slice_convs
        }

        def feats(img):
            if self.normalize:
                img = 2.0 * img - 1.0
            img = (img - shift) / scale
            outs = []
            z = img
            prev = -1
            for slice_convs in _VGG16_SLICES:
                for idx, _ in slice_convs:
                    for p in range(prev + 1, idx):
                        if p in _VGG16_POOL_AFTER:
                            z = _max_pool2(z)
                    z = convs[idx](z)
                    z = jax.nn.relu(z)
                    prev = idx
                outs.append(z)
            return outs

        fx = feats(x)
        fy = feats(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2  # (B,H,W,C)
            if self.use_linear_weights:
                w = self.param(
                    f"lin{i}",
                    nn.initializers.constant(1.0 / d.shape[-1]),
                    (d.shape[-1],),
                )
                d = d * w
                dist = jnp.sum(d, axis=-1)
            else:
                dist = jnp.mean(d, axis=-1)
            total = total + jnp.mean(dist, axis=(1, 2))
        return total  # (B,)
