"""VGG19 perceptual feature extractor (for the pyramid perceptual loss).

Mirrors the reference's five relu slices of torchvision vgg19.features
(/root/reference/modules/model.py:81-123): relu1_1, relu2_1, relu3_1,
relu4_1, relu5_1, with ImageNet mean/std normalization. Conv submodules are
named `features_<torch index>` so a torchvision vgg19 state_dict converts
mechanically. Weights are frozen by excluding the `vgg` subtree from the
optimizer masks (see train/optim.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import conv2d

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision vgg19.features conv indices per slice boundary [0,2,7,12,21,30)
_SLICE_CONVS = [
    [(0, 64)],
    [(2, 64), (5, 128)],
    [(7, 128), (10, 256)],
    [(12, 256), (14, 256), (16, 256), (19, 512)],
    [(21, 512), (23, 512), (25, 512), (28, 512)],
]
# indices after which a 2x2 max-pool runs (inside the slices above)
_POOL_AFTER = {4, 9, 18, 27}


def _max_pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


class Vgg19(nn.Module):
    """Returns the 5 relu-slice activations for input images in [0, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
        x = (x - mean) / std

        outs = []
        prev_idx = -1
        for slice_convs in _SLICE_CONVS:
            for idx, ch in slice_convs:
                # replay any pool between the previous conv and this one
                for p in range(prev_idx + 1, idx):
                    if p in _POOL_AFTER:
                        x = _max_pool2(x)
                x = conv2d(ch, 3, padding=1, name=f"features_{idx}")(x)
                x = jax.nn.relu(x)
                prev_idx = idx
            outs.append(x)
        return outs
