"""Background affine motion predictor.

Semantics of /root/reference/modules/bg_motion_predictor.py:5-24: ResNet-18
over the channel-concatenated (source, driving) pair, fc head initialized to
the identity affine, output a 3x3 matrix with fixed last row [0, 0, 1].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.resnet import ResNet18


def _identity_affine_bias(key, shape, dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=dtype)


class BGMotionPredictor(nn.Module):
    def setup(self):
        self.bg_encoder = ResNet18(
            num_outputs=6,
            in_channels=6,
            fc_kernel_init=nn.initializers.zeros,
            fc_bias_init=_identity_affine_bias,
            name="bg_encoder",
        )

    def __call__(self, source_image, driving_image, train: bool = False):
        bs = source_image.shape[0]
        x = jnp.concatenate([source_image, driving_image], axis=-1)
        pred = self.bg_encoder(x, train).reshape(bs, 2, 3)
        last = jnp.broadcast_to(
            jnp.array([[0.0, 0.0, 1.0]], dtype=pred.dtype)[None], (bs, 1, 3)
        )
        return jnp.concatenate([pred, last], axis=1)  # (B, 3, 3)
