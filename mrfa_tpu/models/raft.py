"""RaftFlow — the multi-resolution motion refinement decoder (MRFA's core).

Behavioral spec re-derived from /root/reference/modules/raft.py:12-311:
  - a 4096x4096 structure correlation volume between driving/source keypoint
    structure features at the 64x64 basic resolution (a single MXU einsum),
  - a 6-step coarse-to-fine loop over resolutions 8..256 px that looks up a
    2-level, 7x7-window correlation pyramid per query pixel, encodes motion
    features, warps generator features and regresses flow/occlusion deltas,
  - telescoping upsampling of the refined deltas on top of the prior flow,
  - final decoding through the occlusion-aware generator, with a parallel
    "coarse" branch warped by the prior flow alone.

TPU-first notes: the loop has a static trip count (fully unrolled at trace
time); corr pooling is reshape+mean; all resizes are matmul-form; the 49-point
window lookup is the gather hot spot (Pallas kernel: ops/pallas_kernels.py).

The correlation channel order quirk of the reference (window x-offset varies
along the *first* window axis) is preserved so converted conv weights match.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrfa_tpu.models.generator import OcclusionAwareGenerator
from mrfa_tpu.nn.blocks import Hourglass, conv2d
from mrfa_tpu.ops.corr import (
    corr_block_lookup,
    corr_block_lookup_fast,
    corr_window_offsets,
)
from mrfa_tpu.ops.grid import coords_grid, kp2gaussian
from mrfa_tpu.ops.resize import avg_pool, resize_bilinear
from mrfa_tpu.ops.sampler import grid_sample, sample_pixel


class BasicMotionEncoder(nn.Module):
    num_levels: int = 2
    radius: int = 3

    @nn.compact
    def __call__(self, delta_flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
        cor = jax.nn.relu(conv2d(128, 1, name="convc1")(corr))
        cor = jax.nn.relu(conv2d(96, 3, padding=1, name="convc2")(cor))
        flo = jax.nn.relu(conv2d(128, 7, padding=3, name="convf1")(delta_flow))
        flo = jax.nn.relu(conv2d(64, 3, padding=1, name="convf2")(flo))
        out = jax.nn.relu(
            conv2d(126, 3, padding=1, name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, delta_flow], axis=-1)  # 128 channels


class RefineFlow(nn.Module):
    @nn.compact
    def __call__(self, m_f: jnp.ndarray, warp_f: jnp.ndarray):
        c = jax.nn.relu(conv2d(128, 3, padding=1, name="convc1")(warp_f))
        inp = jnp.concatenate([m_f, c], axis=-1)  # 256 channels
        flow = conv2d(2, 3, padding=1, name="conv2")(
            jax.nn.relu(conv2d(128, 3, padding=1, name="conv1")(inp))
        )
        occ = conv2d(1, 3, padding=1, name="convo2")(
            jax.nn.relu(conv2d(128, 3, padding=1, name="convo1")(inp))
        )
        return jnp.concatenate([flow, occ], axis=-1), inp


def _trunc_normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class RaftFlow(nn.Module):
    prior_only: bool = False
    num_kp: int = 10
    dim: int = 256
    size: int = 256
    generator: Optional[Dict[str, Any]] = None
    driving_encoder: Optional[Dict[str, Any]] = None
    source_encoder: Optional[Dict[str, Any]] = None
    remat: bool = False  # rematerialize loop iterations to save train memory
    fast_lookup: bool = True  # kept for config compat; see lookup_impl
    lookup_impl: str = "auto"  # auto | pallas | xla | gather (all exact)

    def setup(self):
        self.scale = self.dim**-0.5
        self.h = self.size // 4
        self.w = self.size // 4
        self.total_iter = int(math.log2(32)) + 1  # 6 fixed refinement steps
        self.basic_res_index = int(math.log2(self.h // (self.size // 32)))
        self.gen = OcclusionAwareGenerator(**(self.generator or {}), name="generator")

        if not self.prior_only:
            channels = {
                self.size // 32: 512,
                self.size // 16: 512,
                self.size // 8: 512,
                self.size // 4: 256,
                self.size // 2: 128,
                self.size: 64,
            }
            # remat trades recompute for activation memory in the unrolled
            # refinement loop (training only; parameters are unaffected)
            hourglass_cls = (
                nn.remat(Hourglass, static_argnums=(2,)) if self.remat else Hourglass
            )
            self.kp = hourglass_cls(**(self.driving_encoder or {}), name="kp")
            self.kp_img = hourglass_cls(**(self.source_encoder or {}), name="kp_img")
            self.kp_head = conv2d(self.dim, 1, name="kp_head")
            self.kp_img_head = conv2d(self.dim, 1, name="kp_img_head")
            # learned positional embedding, stored in torch layout (1,K,h,w)
            # so the checkpoint converter stays mechanical
            self.pos_embedding = self.param(
                "pos_embedding",
                _trunc_normal_init(0.02),
                (1, self.num_kp, self.h, self.w),
            )
            # with remat=True whole refinement iterations are checkpointed
            # (see _refine_iter below), which subsumes per-submodule remat
            self.corr_enc = BasicMotionEncoder(name="corr_enc")
            self.refine = RefineFlow(name="refine")
            self.to_context = [
                conv2d(192, 1, name=f"to_context_{i}")
                for i in range(self.total_iter)
            ]
            self._channels = channels

    def _resolve_lookup_impl(self, bq: int) -> str:
        impl = self.lookup_impl
        if not self.fast_lookup and impl == "auto":
            impl = "gather"
        if impl == "auto":
            # Pallas on real TPU from 256 queries up. Honest per-op timing
            # (value-fetch completion, v5e, 64x64 maps): BQ=256 1.1 vs 2.7ms,
            # BQ=1024 2.5 vs 4.9ms, BQ=4096 4.2 vs 19.9ms (pallas vs XLA) —
            # the XLA patch-slice path lowers its vmapped dynamic_slice to a
            # serialized while loop on TPU. Round-1's >=16384 threshold was
            # tuned on tunnel dispatch rates, not device execution.
            try:
                platform = jax.devices()[0].platform
            except Exception:
                platform = "cpu"
            on_tpu = platform in ("tpu", "axon")
            impl = "pallas" if on_tpu and bq >= 256 else "xla"
        return impl

    def _lookup(self, corr_src, coords):
        """Dispatch the correlation lookup implementation (all exact)."""
        impl = self._resolve_lookup_impl(corr_src.shape[0])
        if impl == "pallas":
            from mrfa_tpu.ops.pallas_kernels import corr_block_lookup_pallas

            return corr_block_lookup_pallas(corr_src, coords)
        if impl == "xla":
            return corr_block_lookup_fast(corr_src, coords)
        return corr_block_lookup(corr_src, coords)

    def _refine_iter(
        self,
        i: int,
        train: bool,
        flow,
        occlusion,
        d_f_pre,
        d_occ_pre,
        corr_hw,
        feature_i,
        init_flow,
        init_occlusion,
        deformation,
        occ_prior,
    ):
        """One refinement iteration (resolution (size//32)*2^i).

        Packaged as a method so training can rematerialize whole iterations
        (`nn.remat` in __call__): every intra-iteration activation — pooled
        correlation slabs, the 98-channel lookups, motion features, refine
        convs — is recomputed in the backward instead of living in HBM for
        the rest of the forward. Iteration boundaries (flow/occlusion carries
        and the per-scale outputs) are the only saved tensors.
        """
        b = flow.shape[0]
        res = (self.size // 32) * (2**i)
        id_grid = coords_grid(res, res, dtype=flow.dtype)[None]

        # -- select query coords and the (possibly pooled) corr volume --
        if i < self.basic_res_index:
            f = 2 ** (self.basic_res_index - i)
            pooled = avg_pool(corr_hw, f)  # (B,res,res,n_src) pooled driving
            scale = float(f)
            flow_sample, id_grid_sample = flow, id_grid
        elif i == self.basic_res_index:
            pooled = corr_hw
            scale = 1.0
            flow_sample, id_grid_sample = flow, id_grid
        else:
            pooled = corr_hw
            scale = 1.0
            flow_sample = resize_bilinear(flow, self.h, align_corners=True) * (
                0.5 ** (i - self.basic_res_index)
            )
            id_grid_sample = coords_grid(self.h, self.w, dtype=flow.dtype)[None]

        hq = pooled.shape[1]
        corr_src = pooled.reshape(b * hq * hq, self.h, self.w, 1)
        coords = (flow_sample + id_grid_sample) * scale  # (B,hq,hq,2)
        corr = self._lookup(corr_src, coords.reshape(-1, 2))
        corr = corr.reshape(b, hq, hq, -1)  # (B,hq,hq,98)
        if i > self.basic_res_index:
            corr = resize_bilinear(corr, res, align_corners=True)

        m_f = self.corr_enc(flow, corr)
        warp_f = sample_pixel(feature_i, flow + id_grid)
        warp_f = jax.nn.relu(self.to_context[i](warp_f))

        d_all, _ = self.refine(m_f, warp_f)
        d_flow = d_all[..., 0:2]
        d_occ = d_all[..., 2:3]
        flow_w = flow + d_flow
        occlusion = occlusion + d_occ

        warp_f_out = sample_pixel(feature_i, flow_w + id_grid)
        occ_out = jax.nn.sigmoid(occlusion)

        # -- coarse branch: warp by the prior flow alone --
        if i != self.basic_res_index:
            flow_res = resize_bilinear(deformation, res, align_corners=True)
            occlusion_res = resize_bilinear(occ_prior, res, align_corners=True)
        else:
            flow_res = deformation
            occlusion_res = occ_prior
        warp_f_c_out = grid_sample(feature_i, flow_res, align_corners=False)
        occ_c_out = jax.nn.sigmoid(occlusion_res)

        # -- telescoping upsample of deltas on top of the prior flow --
        if i < self.total_iter - 1:
            nxt = res * 2
            scale_init = 2.0 ** (self.basic_res_index - i) / 2.0
            d_f = resize_bilinear(d_flow, nxt, align_corners=True) * 2.0
            flow = d_f + resize_bilinear(init_flow, nxt, align_corners=True) / scale_init
            if d_f_pre is None:
                d_f_pre = d_f
            else:
                up_pre = resize_bilinear(d_f_pre, nxt, align_corners=True) * 2.0
                flow = flow + up_pre
                d_f_pre = d_f + up_pre
            d_occ_up = resize_bilinear(d_occ, nxt, align_corners=True)
            occlusion = d_occ_up + resize_bilinear(
                init_occlusion, nxt, align_corners=True
            )
            if d_occ_pre is None:
                d_occ_pre = d_occ_up
            else:
                up_occ_pre = resize_bilinear(d_occ_pre, nxt, align_corners=True)
                occlusion = occlusion + up_occ_pre
                d_occ_pre = d_occ_up + up_occ_pre

        return (
            flow, occlusion, d_f_pre, d_occ_pre,
            warp_f_out, occ_out, warp_f_c_out, occ_c_out,
        )

    def encode_source(self, kp_s, img, img_full, train=False):
        """Per-clip-constant source-side work, hoistable out of the serving
        frame loop: the generator feature pyramid of the source image and
        the source-side correlation projection f_s.

        The reference recomputes both every frame
        (/root/reference/demo.py:55-72 calls the decoder with the same
        source; raft.py:143,176-186 re-encode it) — hoisting is pure
        serving win with identical semantics (eval mode: no BN-stat or
        dropout coupling). Returns a pytree cache for __call__'s
        `source_cache` argument.
        """
        feature = OcclusionAwareGenerator.encode(self.gen, img_full, train)
        if self.prior_only:
            return {"feature": tuple(feature)}
        b, h, w, _ = img.shape
        pos = jnp.transpose(self.pos_embedding, (0, 2, 3, 1))  # (1,h,w,K)
        g_s = kp2gaussian(kp_s, (h, w), 0.1) + pos
        fe_s = self.kp_img(jnp.concatenate([g_s, img], axis=-1), train)
        k_s = self.kp_img_head(fe_s)  # (B,h,w,dim)
        f_s = k_s.reshape(b, h * w, self.dim)
        return {"feature": tuple(feature), "f_s": f_s}

    def _prior_only_forward(self, dense_motion, feature, img_full, train):
        flow = dense_motion["deformation"]  # (B,64,64,2) normalized
        occlusion = dense_motion["occlusion"]  # logits
        out_warp_f, out_occlusion = [], []
        flow_res = flow
        for i in range(self.total_iter):
            res = feature[i].shape[1]
            if flow.shape[1] != res:
                flow_res = resize_bilinear(flow, res, align_corners=True)
                occlusion_res = resize_bilinear(occlusion, res, align_corners=True)
            else:
                flow_res = flow
                occlusion_res = occlusion
            out_warp_f.append(
                grid_sample(feature[i], flow_res, align_corners=False)
            )
            out_occlusion.append(jax.nn.sigmoid(occlusion_res))
        warp_img = grid_sample(img_full, flow_res, align_corners=False)
        out = self.gen.decode(out_warp_f, warp_img, out_occlusion, train=train)
        vis = [
            resize_bilinear(o, self.size, align_corners=True) for o in out_occlusion
        ]
        occlusion_vis = jnp.concatenate(vis, axis=2)  # concat along width
        return out, warp_img, occlusion_vis

    def __call__(
        self,
        kp_s: jnp.ndarray,
        kp_d: jnp.ndarray,
        dense_motion: Dict[str, jnp.ndarray],
        img: jnp.ndarray,
        img_full: jnp.ndarray,
        train: bool = False,
        source_cache: Optional[Dict[str, Any]] = None,
    ):
        # training memory: remat the generator encode/decode as units (their
        # intra-block activations at up to size^2 resolution dominate; only
        # the 6 pyramid maps / the decoded image are saved across them)
        if source_cache is not None:
            # serving fast path: per-clip-constant source work precomputed
            # by encode_source (identical values; eval mode only)
            feature = list(source_cache["feature"])
        else:
            encode_fn = (
                nn.remat(OcclusionAwareGenerator.encode, static_argnums=(2,))
                if self.remat
                else OcclusionAwareGenerator.encode
            )
            feature = encode_fn(self.gen, img_full, train)  # coarse->fine

        if self.prior_only:
            return self._prior_only_forward(dense_motion, feature, img_full, train)

        b, h, w, _ = img.shape
        pos = jnp.transpose(self.pos_embedding, (0, 2, 3, 1))  # (1,h,w,K)

        # --- structure correlation volume at the basic resolution (einsum) ---
        if source_cache is not None:
            f_s = source_cache["f_s"]
        else:
            g_s = kp2gaussian(kp_s, (h, w), 0.1) + pos
            fe_s = self.kp_img(jnp.concatenate([g_s, img], axis=-1), train)
            k_s = self.kp_img_head(fe_s)  # (B,h,w,dim)
            f_s = k_s.reshape(b, h * w, self.dim)
        g_d = kp2gaussian(kp_d, (h, w), 0.1) + pos
        fe_d = self.kp(g_d, train)
        q_d = self.kp_head(fe_d)
        f_d = q_d.reshape(b, h * w, self.dim)
        corr_volume = jnp.einsum("bic,bjc->bij", f_d, f_s) * self.scale
        # (B, n_driving, n_source). Under a ('data','model') mesh the volume
        # is sharded over the driving (query) axis: the einsum partitions
        # with f_d row-sharded and f_s replicated (no collective), and every
        # downstream pooling/lookup touches only local query rows.
        from mrfa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, maybe_constrain

        corr_volume = maybe_constrain(corr_volume, DATA_AXIS, MODEL_AXIS, None)

        # --- prior motion initialization (normalized -> pixel flow) ---
        id_grid64 = coords_grid(h, w, dtype=corr_volume.dtype)[None]
        init_flow = (h - 1) * (dense_motion["deformation"] + 1.0) / 2.0 - id_grid64
        init_occlusion = dense_motion["occlusion"]

        flow = resize_bilinear(init_flow, self.size // 32, align_corners=True) / 8.0
        occlusion = resize_bilinear(
            init_occlusion, self.size // 32, align_corners=True
        )

        # corr volume viewed with the driving axis spatial: (B, hd, wd, n_src)
        corr_hw = corr_volume.reshape(b, h, w, h * w)
        corr_hw = maybe_constrain(corr_hw, DATA_AXIS, MODEL_AXIS, None, None)

        out_warp_f: List[jnp.ndarray] = []
        out_occlusion: List[jnp.ndarray] = []
        out_warp_f_c: List[jnp.ndarray] = []
        out_occlusion_c: List[jnp.ndarray] = []
        d_f_pre = None
        d_occ_pre = None

        # per-iteration rematerialization (training memory): i and train are
        # static (args 1, 2 counting self as 0)
        iter_fn = (
            nn.remat(type(self)._refine_iter, static_argnums=(1, 2))
            if self.remat
            else type(self)._refine_iter
        )

        for i in range(self.total_iter):
            (
                flow, occlusion, d_f_pre, d_occ_pre,
                warp_f_i, occ_i, warp_f_c_i, occ_c_i,
            ) = iter_fn(
                self, i, train, flow, occlusion, d_f_pre, d_occ_pre,
                corr_hw, feature[i], init_flow, init_occlusion,
                dense_motion["deformation"], dense_motion["occlusion"],
            )
            out_warp_f.append(warp_f_i)
            out_occlusion.append(occ_i)
            out_warp_f_c.append(warp_f_c_i)
            out_occlusion_c.append(occ_c_i)

        # NB: matches the reference — the final warp uses the pre-refinement
        # flow of the last iteration (raft.py:302 uses `flow`, not `flow_w`)
        id_grid = coords_grid(self.size, self.size, dtype=flow.dtype)[None]
        warp_img = sample_pixel(img_full, flow + id_grid)
        decode_fn = (
            nn.remat(OcclusionAwareGenerator.decode, static_argnums=(6,))
            if self.remat
            else OcclusionAwareGenerator.decode
        )
        out = decode_fn(
            self.gen, out_warp_f, warp_img, out_occlusion,
            out_warp_f_c, out_occlusion_c, train,
        )

        out_occlusion.append(jax.nn.sigmoid(init_occlusion))
        vis = [
            resize_bilinear(o, self.size, align_corners=True) for o in out_occlusion
        ]
        occlusion_vis = jnp.concatenate(vis, axis=2)
        return out, warp_img, occlusion_vis
