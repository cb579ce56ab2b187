"""MTIA prior encoder: HRNet trunk + TokenPose transformer head.

Behavioral spec re-derived from /root/reference/modules/transformer/
pose_tokenpose_b.py:16-62 and tokenpose_base.py:230-468:
  - patchify the 64x64x32 HRNet feature into 4x4 patches -> 256 tokens (192-d),
  - prepend 2K learned query tokens (K keypoint + K jacobian tokens),
  - 12-layer ViT, 8 heads, per-head scaling, GELU MLP (ratio 3); the fixed
    sine position embedding is re-added to the image tokens before every
    layer after the first ("sine-full"),
  - heads: LayerNorm+Linear -> 2*sigmoid(kp)-1, and a jacobian head
    initialized to the identity.

Attention over 276 tokens is a plain MXU batched matmul — no masking, no KV
cache; f32 softmax.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrfa_tpu.models.hrnet import HRNetBase
from mrfa_tpu.nn.blocks import dense
from mrfa_tpu.nn.norm import LayerNorm


def sine_position_embedding(h: int, w: int, d_model: int) -> np.ndarray:
    """2-D sine position embedding, (1, h*w, d_model), reference layout."""
    scale = 2 * math.pi
    eps = 1e-6
    area = np.ones((1, h, w), dtype=np.float32)
    y_embed = area.cumsum(1)
    x_embed = area.cumsum(2)
    one_dir = d_model // 2
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = np.arange(one_dir, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / one_dir)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = np.stack((np.sin(pos_x[:, :, :, 0::2]), np.cos(pos_x[:, :, :, 1::2])), axis=4)
    pos_x = pos_x.reshape(*pos_x.shape[:3], -1)
    pos_y = np.stack((np.sin(pos_y[:, :, :, 0::2]), np.cos(pos_y[:, :, :, 1::2])), axis=4)
    pos_y = pos_y.reshape(*pos_y.shape[:3], -1)
    pos = np.concatenate((pos_y, pos_x), axis=3)  # (1,h,w,d)
    return pos.reshape(1, h * w, d_model)


class Attention(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        h = self.heads
        dh = self.dim // h
        scale = dh**-0.5  # per-head scaling (scale_with_head=True)
        qkv = dense(self.dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return dense(self.dim, name="to_out_0")(out)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = dense(self.hidden_dim, name="net_0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return dense(self.dim, name="net_3")(x)


class PreNormAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        return Attention(self.dim, self.heads, name="fn")(
            LayerNorm(self.dim, name="norm")(x)
        )


class PreNormFeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        return FeedForward(self.dim, self.hidden_dim, name="fn")(
            LayerNorm(self.dim, name="norm")(x)
        )


class ResidualAttn(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        return x + PreNormAttention(self.dim, self.heads, name="fn")(x)


class ResidualFF(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        return x + PreNormFeedForward(self.dim, self.hidden_dim, name="fn")(x)


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_keypoints: int
    all_attn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        nk = self.num_keypoints
        for d in range(self.depth):
            if d > 0 and self.all_attn:
                x = x.at[:, nk:].add(pos)
            x = ResidualAttn(self.dim, self.heads, name=f"layers_{d}_0")(x)
            x = ResidualFF(self.dim, self.mlp_dim, name=f"layers_{d}_1")(x)
        return x


def _trunc_normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class TokenPoseTB(nn.Module):
    """Transformer head over patchified HRNet features ("transformer" in torch)."""

    feature_size: int = 64
    patch_size: int = 4
    num_keypoints: int = 10
    dim: int = 192
    depth: int = 12
    heads: int = 8
    mlp_ratio: int = 3
    channels: int = 32
    estimate_jacobian: bool = True

    def setup(self):
        p = self.patch_size
        fh = self.feature_size // p
        self.num_patches = fh * fh
        nk = 2 * self.num_keypoints  # jacobian tokens double the query count
        self.nk = nk
        self.keypoint_token = self.param(
            "keypoint_token", _trunc_normal_init(0.02), (1, nk, self.dim)
        )
        self._pos = jnp.asarray(sine_position_embedding(fh, fh, self.dim))
        self.patch_to_embedding = dense(self.dim, name="patch_to_embedding")
        self.transformer = Transformer(
            self.dim, self.depth, self.heads, self.dim * self.mlp_ratio,
            num_keypoints=nk, name="transformer",
        )
        self.mlp_head_0 = LayerNorm(self.dim, name="mlp_head_0")
        self.mlp_head_1 = dense(2, name="mlp_head_1")
        if self.estimate_jacobian:
            self.mlp_head_jacobian_0 = LayerNorm(self.dim, name="mlp_head_jacobian_0")
            self.mlp_head_jacobian_1 = nn.Dense(
                4,
                kernel_init=nn.initializers.zeros,
                bias_init=lambda key, shape, dtype=jnp.float32: jnp.array(
                    [1.0, 0.0, 0.0, 1.0], dtype=dtype
                ),
                name="mlp_head_jacobian_1",
            )

    def __call__(self, feature: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, fh, fw, c = feature.shape
        p = self.patch_size
        h, w = fh // p, fw // p
        # patchify with (p1, p2, c) ordering inside each patch
        x = feature.reshape(b, h, p, w, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * w, p * p * c)
        x = self.patch_to_embedding(x)
        n = x.shape[1]

        kp_tokens = jnp.broadcast_to(self.keypoint_token, (b, self.nk, self.dim))
        x = x + self._pos[:, :n]
        x = jnp.concatenate([kp_tokens, x], axis=1)
        x = self.transformer(x, self._pos)

        x_keypoint = x[:, 0 : self.nk // 2]
        keypoint = 2.0 * jax.nn.sigmoid(
            self.mlp_head_1(self.mlp_head_0(x_keypoint))
        ) - 1.0
        out = {"kp": keypoint}
        if self.estimate_jacobian:
            x_jac = x[:, self.nk // 2 : self.nk]
            jac = self.mlp_head_jacobian_1(self.mlp_head_jacobian_0(x_jac))
            out["jacobian"] = jac.reshape(b, self.nk // 2, 2, 2)
        return out


class TokenPoseB(nn.Module):
    """Full MTIA encoder: HRNet trunk ("pre_feature") + TokenPose head."""

    num_keypoints: int = 10
    dim: int = 192
    depth: int = 12
    heads: int = 8
    mlp_ratio: int = 3
    image_size: int = 256
    patch_size: int = 4
    base_channel: int = 32
    estimate_jacobian: bool = True

    def setup(self):
        self.pre_feature = HRNetBase(name="pre_feature")
        self.transformer = TokenPoseTB(
            feature_size=self.image_size // 4,
            patch_size=self.patch_size,
            num_keypoints=self.num_keypoints,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            channels=self.base_channel,
            estimate_jacobian=self.estimate_jacobian,
            name="transformer",
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feat = self.pre_feature(x, train)
        return self.transformer(feat)
