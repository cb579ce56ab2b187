"""Occlusion-aware encoder/decoder generator.

Semantics match /root/reference/modules/generator.py:8-69: `encode` returns
multi-scale source features coarsest-first; `decode` merges per-scale warped
features gated by occlusion maps, optionally concat-compressing with
coarse-prior-warped features, and composites the final RGB with the warped
full-res image through the finest occlusion map.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import (
    ChannelBlock2d,
    DownBlock2d,
    ResBlock2d,
    SameBlock2d,
    SpaceToDepthConv,
    UpBlock2d,
    conv2d,
)


class OcclusionAwareGenerator(nn.Module):
    num_channels: int = 3
    block_expansion: int = 64
    max_features: int = 512
    num_up_blocks: int = 5

    def setup(self):
        be, mf, n = self.block_expansion, self.max_features, self.num_up_blocks
        self.first = SameBlock2d(be, kernel_size=7, padding=3, name="first")
        down, up, res, chan = [], [], [], []
        for i in range(n):
            in_features = min(mf, be * (2**i))
            out_features = min(mf, be * (2 ** (i + 1)))
            down.append(DownBlock2d(out_features, name=f"down_blocks_{i}"))
            up.append((out_features, in_features))
            res.append(out_features)
            chan.append(out_features * 2)
        # decoder stacks run coarsest-first (reversed), matching torch naming
        self.down_blocks = down
        self.up_blocks = [
            UpBlock2d(in_f, name=f"up_blocks_{idx}")
            for idx, (_, in_f) in enumerate(reversed(up))
        ]
        self.resblock = [
            ResBlock2d(f, name=f"resblock_{idx}") for idx, f in enumerate(reversed(res))
        ]
        self.channel_block = [
            ChannelBlock2d(f, name=f"channel_block_{idx}")
            for idx, f in enumerate(reversed(chan))
        ]
        # 7x7 -> 3ch at full resolution: space-to-depth form (same params,
        # exact math, ~5x fewer MXU-padded FLOPs than the direct conv)
        self.final = SpaceToDepthConv(self.num_channels, name="final")

    def encode(self, x: jnp.ndarray, train: bool) -> List[jnp.ndarray]:
        """(B, H, W, C) -> feature pyramid, coarsest (H/2^n) first."""
        f = []
        out = self.first(x, train)
        f.append(out)
        for blk in self.down_blocks:
            out = blk(out, train)
            f.append(out)
        return f[::-1]

    def decode(
        self,
        warp_f: List[jnp.ndarray],
        warp_img: jnp.ndarray,
        occlusion: List[jnp.ndarray],
        warp_f_c: Optional[List[jnp.ndarray]] = None,
        occlusion_c: Optional[List[jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        del occlusion_c  # reserved (reference accepts but ignores it too)
        out = warp_f[0] * occlusion[0]
        if warp_f_c is not None:
            out = jnp.concatenate([out, warp_f_c[0]], axis=-1)
        for i in range(self.num_up_blocks):
            if warp_f_c is not None:
                out = self.channel_block[i](out, train)
            out = self.resblock[i](out, train)
            out = self.up_blocks[i](out, train)
            occ = occlusion[i + 1]
            out = warp_f[i + 1] * occ + out * (1.0 - occ)
            if warp_f_c is not None and i != self.num_up_blocks - 1:
                out = jnp.concatenate([out, warp_f_c[i + 1]], axis=-1)
        out = self.final(out)
        out = jax.nn.sigmoid(out)
        out = out * (1.0 - occlusion[-1]) + warp_img * occlusion[-1]
        return out

    def __call__(self, x, train: bool = False):
        feats = self.encode(x, train)
        ones = [jnp.ones_like(f[..., :1]) for f in feats]
        return self.decode(feats, x, ones, train=train)
