"""Dense motion networks: sparse keypoint motions -> dense flow + occlusion.

Semantics match /root/reference/modules/dense_motion.py:
  - DenseMotionNetwork (FOMM/MTIA priors, lines 8-146): per-kp translation
    (+ jacobian correction) sparse motions, heatmap differences, hourglass,
    channel softmax -> convex combination deformation, occlusion logits.
    Source warping uses align_corners=False (torch grid_sample default).
  - TPSDenseMotionNetwork (TPSM prior, lines 150-312): K exact TPS transforms
    from K x 5 keypoint pairs + affine background, dropout-softmax over
    contribution maps. Source warping uses align_corners=True.

NHWC throughout; the hourglass input channel order interleaves per-motion
(heatmap, RGB) exactly like the reference's (B, (K+1)*4, H, W) reshape so
converted checkpoints are bit-compatible.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.nn.blocks import Hourglass, conv2d, conv2d_taps
from mrfa_tpu.ops.grid import (
    from_homogeneous,
    kp2gaussian,
    make_coordinate_grid,
    to_homogeneous,
)
from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample
from mrfa_tpu.ops.sampler import grid_sample
from mrfa_tpu.ops.tps import tps_fit, tps_transform_grid


def _dropout_softmax(logits: jnp.ndarray, p, rng) -> jnp.ndarray:
    """Channel dropout-softmax (Eq 7-8 of TPSM).

    logits: (B, h, w, K+1); channels are dropped per (batch, channel) with
    probability p, channel 0 always kept. (The reference's inverted-dropout
    rescale line operates on a dead tensor — working behavior preserved.)
    """
    b, h, w, c = logits.shape
    keep = jax.random.uniform(rng, (b, c)) < (1.0 - p)
    keep = keep.at[:, 0].set(True)
    keep = keep[:, None, None, :].astype(logits.dtype)
    x = logits - jnp.max(logits, axis=-1, keepdims=True)
    x_exp = jnp.exp(x) * keep
    partition = jnp.sum(x_exp, axis=-1, keepdims=True) + 1e-6
    return x_exp / partition


class DenseMotionNetwork(nn.Module):
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    num_kp: int = 10
    num_channels: int = 3
    estimate_occlusion_map: bool = True
    scale_factor: float = 0.25
    kp_variance: float = 0.01

    def setup(self):
        k1 = self.num_kp + 1
        self.hourglass = Hourglass(
            self.block_expansion,
            in_features=k1 * (self.num_channels + 1),
            max_features=self.max_features,
            num_blocks=self.num_blocks,
            name="hourglass",
        )
        # 11-/1-channel 7x7 heads: tap-matmul form (the direct conv ran at
        # ~1% MFU — 0.2 ms/frame in the serving profile)
        self.mask = conv2d_taps(k1, 7, padding=3, mode="out", name="mask")
        if self.estimate_occlusion_map:
            self.occlusion = conv2d_taps(
                1, 7, padding=3, mode="out", name="occlusion"
            )
        self._aa = AntiAliasParams.create(self.scale_factor)

    def create_heatmap_representations(self, h, w, kp_driving, kp_source):
        g_d = kp2gaussian(kp_driving["kp"], (h, w), self.kp_variance)  # (B,h,w,K)
        g_s = kp2gaussian(kp_source["kp"], (h, w), self.kp_variance)
        heatmap = g_d - g_s
        zeros = jnp.zeros_like(heatmap[..., :1])
        return jnp.concatenate([zeros, heatmap], axis=-1)  # (B,h,w,K+1)

    def create_sparse_motions(self, h, w, kp_driving, kp_source, bg_param=None):
        """Per-motion backward grids T_{s<-d}: (B, K+1, h, w, 2), normalized."""
        kp_d = kp_driving["kp"]
        kp_s = kp_source["kp"]
        bs, num_kp = kp_d.shape[:2]
        grid = make_coordinate_grid(h, w, dtype=kp_d.dtype)  # (h,w,2)
        coordinate_grid = grid[None, None] - kp_d[:, :, None, None, :]  # (B,K,h,w,2)
        if "jacobian" in kp_driving:
            jac = jnp.matmul(
                kp_source["jacobian"], jnp.linalg.inv(kp_driving["jacobian"])
            )  # (B,K,2,2)
            coordinate_grid = jnp.einsum(
                "bkij,bkhwj->bkhwi", jac, coordinate_grid
            )
        driving_to_source = coordinate_grid + kp_s[:, :, None, None, :]

        bg_grid = jnp.broadcast_to(grid[None, None], (bs, 1, h, w, 2))
        if bg_param is not None:
            bgh = to_homogeneous(bg_grid)
            bgh = jnp.einsum("bij,bkhwj->bkhwi", bg_param, bgh)
            bg_grid = from_homogeneous(bgh)

        return jnp.concatenate([bg_grid, driving_to_source], axis=1)

    def create_deformed_source_image(self, source_image, sparse_motions):
        """Warp the source by each motion: (B, K+1, h, w, C), zeros pad."""
        bs, h, w, c = source_image.shape
        k1 = sparse_motions.shape[1]
        # warp pixels in the compute dtype (geometry stays f32): the gather
        # is descriptor-rate-bound and measurably faster on bf16 rows
        from mrfa_tpu.precision import get_compute_dtype

        cd = get_compute_dtype()
        if cd is not None:
            source_image = source_image.astype(cd)
        # fold the K+1 motions into the QUERY axis instead of broadcasting
        # the source into a (bs*k1) batch: every motion warps the SAME
        # source, so one shared gather table per sample serves all k1*h*w
        # queries. The batched-table gather ran at 6.6 ns/descriptor vs
        # 1.7 for the single-table form (serving frame profile), and the
        # backward splat accumulates over motions in one pass.
        grids = sparse_motions.reshape(bs, k1 * h, w, 2)
        warped = grid_sample(
            source_image, grids, align_corners=False, padding_mode="zeros"
        )
        return warped.reshape(bs, k1, h, w, c)

    def __call__(
        self,
        source_image: jnp.ndarray,
        kp_driving: dict,
        kp_source: dict,
        bg_param: Optional[jnp.ndarray] = None,
        dropout_flag: bool = False,
        dropout_p=0.0,
        train: bool = False,
    ) -> dict:
        if self.scale_factor != 1:
            source_image = antialias_downsample(source_image, self._aa)
        bs, h, w, c = source_image.shape

        out = {}
        heatmap = self.create_heatmap_representations(h, w, kp_driving, kp_source)
        sparse_motion = self.create_sparse_motions(
            h, w, kp_driving, kp_source, bg_param=bg_param
        )
        deformed = self.create_deformed_source_image(source_image, sparse_motion)
        out["sparse_deformed"] = deformed

        # interleave (heatmap, rgb) per motion to match the reference's
        # (B, (K+1)*(C+1), H, W) channel order
        k1 = self.num_kp + 1
        hm = jnp.transpose(heatmap, (0, 3, 1, 2))[..., None]  # (B,K+1,h,w,1)
        inp = jnp.concatenate([hm, deformed], axis=-1)  # (B,K+1,h,w,C+1)
        inp = jnp.transpose(inp, (0, 2, 3, 1, 4)).reshape(bs, h, w, k1 * (c + 1))

        prediction = self.hourglass(inp, train)
        mask_logits = self.mask(prediction)  # (B,h,w,K+1)
        out["logit_mask"] = mask_logits
        if dropout_flag:
            rng = self.make_rng("dropout")
            mask = _dropout_softmax(mask_logits, dropout_p, rng)
        else:
            mask = jax.nn.softmax(mask_logits, axis=-1)
        out["mask"] = mask
        deformation = jnp.einsum("bkhwc,bhwk->bhwc", sparse_motion, mask)
        out["deformation"] = deformation  # (B,h,w,2) in [-1,1]

        if self.estimate_occlusion_map:
            out["occlusion"] = self.occlusion(prediction)  # logits (B,h,w,1)
        return out


class TPSDenseMotionNetwork(nn.Module):
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    num_tps: int = 10
    num_channels: int = 3
    scale_factor: float = 0.25
    bg: bool = False
    multi_mask: bool = False
    kp_variance: float = 0.01

    def setup(self):
        if self.multi_mask:
            raise NotImplementedError(
                "multi_mask is latent-dead in the reference configs "
                "(/root/reference/modules/dense_motion.py:172-193 has unbound "
                "imports on that path); single occlusion map is supported."
            )
        in_features = (
            self.num_channels * (self.num_tps + 1) + self.num_tps * 5 + 1
        )
        self.hourglass = Hourglass(
            self.block_expansion,
            in_features=in_features,
            max_features=self.max_features,
            num_blocks=self.num_blocks,
            name="hourglass",
        )
        self.maps = conv2d_taps(
            self.num_tps + 1, 7, padding=3, mode="out", name="maps"
        )
        self.occlusion_0 = conv2d_taps(
            1, 7, padding=3, mode="out", name="occlusion_0"
        )
        self._aa = AntiAliasParams.create(self.scale_factor)

    def create_heatmap_representations(self, h, w, kp_driving, kp_source):
        g_d = kp2gaussian(kp_driving["kp"], (h, w), self.kp_variance)
        g_s = kp2gaussian(kp_source["kp"], (h, w), self.kp_variance)
        heatmap = g_d - g_s  # (B,h,w,K*5)
        zeros = jnp.zeros_like(heatmap[..., :1])
        return jnp.concatenate([zeros, heatmap], axis=-1)

    def create_transformations(self, h, w, kp_driving, kp_source, bg_param):
        kp_1 = kp_driving["kp"]
        kp_2 = kp_source["kp"]
        bs = kp_1.shape[0]
        kp_1 = kp_1.reshape(bs, -1, 5, 2)
        kp_2 = kp_2.reshape(bs, -1, 5, 2)
        params = tps_fit(kp_1, kp_2)
        driving_to_source = tps_transform_grid(params, h, w)  # (B,G,h,w,2)

        grid = make_coordinate_grid(h, w, dtype=kp_1.dtype)
        identity = jnp.broadcast_to(grid[None, None], (bs, 1, h, w, 2))
        if bg_param is not None:
            gh = to_homogeneous(identity)
            gh = jnp.einsum("bij,bkhwj->bkhwi", bg_param, gh)
            identity = from_homogeneous(gh)
        return jnp.concatenate([identity, driving_to_source], axis=1)

    def create_deformed_source_image(self, source_image, transformations):
        bs, h, w, c = source_image.shape
        k1 = transformations.shape[1]
        # motions folded into the query axis (see DenseMotionNetwork above)
        grids = transformations.reshape(bs, k1 * h, w, 2)
        # NB: the TPS variant warps with align_corners=True (reference :241)
        warped = grid_sample(
            source_image, grids, align_corners=True, padding_mode="zeros"
        )
        return warped.reshape(bs, k1, h, w, c)

    def __call__(
        self,
        source_image: jnp.ndarray,
        kp_driving: dict,
        kp_source: dict,
        bg_param: Optional[jnp.ndarray] = None,
        dropout_flag: bool = False,
        dropout_p=0.0,
        train: bool = False,
    ) -> dict:
        if self.scale_factor != 1:
            source_image = antialias_downsample(source_image, self._aa)
        bs, h, w, c = source_image.shape

        out = {}
        heatmap = self.create_heatmap_representations(h, w, kp_driving, kp_source)
        transformations = self.create_transformations(
            h, w, kp_driving, kp_source, bg_param
        )
        deformed = self.create_deformed_source_image(source_image, transformations)
        out["deformed_source"] = deformed

        k1 = self.num_tps + 1
        # channel order: heatmaps block first, then per-motion RGB block
        deformed_flat = jnp.transpose(deformed, (0, 2, 3, 1, 4)).reshape(
            bs, h, w, k1 * c
        )
        inp = jnp.concatenate([heatmap, deformed_flat], axis=-1)

        prediction = self.hourglass(inp, train)
        logits = self.maps(prediction)
        if dropout_flag:
            rng = self.make_rng("dropout")
            contribution = _dropout_softmax(logits, dropout_p, rng)
        else:
            contribution = jax.nn.softmax(logits, axis=-1)
        out["contribution_maps"] = contribution
        out["mask"] = contribution

        deformation = jnp.einsum("bkhwc,bhwk->bhwc", transformations, contribution)
        out["deformation"] = deformation
        out["occlusion"] = self.occlusion_0(prediction)
        return out
