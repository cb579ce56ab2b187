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
from mrfa_tpu.nn.blocks import Hourglass, conv2d, conv2d_taps
from mrfa_tpu.ops.corr import (
    corr_block_lookup,
    corr_block_lookup_fast,
    corr_block_lookup_levels,
    corr_block_lookup_levels_gather,
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
        # 7x7 over 2 flow channels: tap-matmul form (k*k*C=98 contraction)
        flo = jax.nn.relu(
            conv2d_taps(128, 7, padding=3, mode="in", name="convf1")(delta_flow)
        )
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
        # 2- and 1-channel heads: per-tap projection + shifted sum (the
        # direct conv runs the MXU at O/128 utilization)
        flow = conv2d_taps(2, 3, padding=1, mode="out", name="conv2")(
            jax.nn.relu(conv2d(128, 3, padding=1, name="conv1")(inp))
        )
        occ = conv2d_taps(1, 3, padding=1, mode="out", name="convo2")(
            jax.nn.relu(conv2d(128, 3, padding=1, name="convo1")(inp))
        )
        return jnp.concatenate([flow, occ], axis=-1), inp


def _warp_decode(
    gen, features, flow_ws, occs, deformation, occ_prior, warp_img, train,
    basic_res_index,
):
    """Per-scale feature warps + coarse prior-flow branch + generator decode
    as ONE region (remat'd under training).

    Split out of _refine_iter so the up-to-(b, 256, 256, 64) warped feature
    tensors are intermediates of THIS checkpointed region — recomputed in
    its backward — instead of per-iteration remat outputs pinned in HBM for
    the whole forward (they cost ~1.3 GB padded at the reference batch 10).
    The iterations hand over only the small flow_w / occlusion tensors.
    """
    from mrfa_tpu.ops.sampler import train_gather_mode

    # Under training these warps sit inside the remat'd decode region: the
    # default img4 pre-expansion of the full-res (b,256,256,64) feature is a
    # 4xC live temp of the backward replay (2x ~341 MB relayout copies in the
    # round-5 b=10 byte profile) — take the train gather mode instead.
    lean = train_gather_mode() if train else False
    out_warp_f, out_warp_f_c, out_occ_c = [], [], []
    for i, (feat, flow_w) in enumerate(zip(features, flow_ws)):
        res = feat.shape[1]
        id_grid = coords_grid(res, res, dtype=flow_w.dtype)[None]
        out_warp_f.append(sample_pixel(feat, flow_w + id_grid, lean=lean))
        # coarse branch: warp by the prior flow alone
        if i != basic_res_index:
            flow_res = resize_bilinear(deformation, res, align_corners=True)
            occ_res = resize_bilinear(occ_prior, res, align_corners=True)
        else:
            flow_res, occ_res = deformation, occ_prior
        out_warp_f_c.append(
            grid_sample(feat, flow_res, align_corners=False, lean=lean)
        )
        out_occ_c.append(jax.nn.sigmoid(occ_res))
    return gen.decode(out_warp_f, warp_img, occs, out_warp_f_c, out_occ_c, train)


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
            # (_refine_iter) AND the two conv stacks inside each iteration
            # are nested remat regions: the iteration's backward replay then
            # materializes one subregion's activations at a time instead of
            # the whole iteration's (~0.5 GB less peak at the reference
            # batch 10, which OOM'd by 84 MB without this)
            sub_cls = (lambda c: nn.remat(c)) if self.remat else (lambda c: c)
            self.corr_enc = sub_cls(BasicMotionEncoder)(name="corr_enc")
            self.refine = sub_cls(RefineFlow)(name="refine")
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
            # Pallas on real TPU from one query block up. Honest per-op
            # timing (value-fetch completion, v5e, 64x64 maps): BQ=256 1.1
            # vs 2.7ms, BQ=1024 2.5 vs 4.9ms, BQ=4096 4.2 vs 19.9ms (pallas
            # vs XLA) — the XLA patch-slice path lowers its vmapped
            # dynamic_slice to a serialized while loop on TPU; the round-5
            # frame profile showed even iteration 0's 64 queries costing
            # 0.16 ms/frame in those loops vs ~4 us for a 4-block Pallas
            # dispatch. Round-1's >=16384 threshold was tuned on tunnel
            # dispatch rates, not device execution.
            try:
                platform = jax.devices()[0].platform
            except Exception:
                platform = "cpu"
            on_tpu = platform in ("tpu", "axon")
            impl = "pallas" if on_tpu and bq >= 64 else "xla"
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

    def _source_layouts(self, f_s, b, h, w):
        """Source features in every layout _build_levels may need: y-major,
        x-major (pallas pret kernel), their 2x2 source-pooled level-1
        counterparts, and the x-PADDED variants whose level einsums emit
        maps already zero-padded on the sublane axis (v3 padded kernel).
        Each is a cheap (B, 4096, 256) permute; unused layouts are
        dead-code-eliminated at trace time on the training path (the
        serving cache materializes all of them once per clip). The
        (4096, 4096) volume of the reference is never materialized in
        y-major + pooled copies: every level is a direct einsum
        (see _build_levels)."""
        from mrfa_tpu.ops.pallas_kernels import PAD as _KPAD

        f_s_sp = f_s.reshape(b, h, w, self.dim)
        f_s_p = avg_pool(f_s_sp, 2)
        f_s_x = jnp.swapaxes(f_s_sp, 1, 2)  # (b, w, h, dim) x-major
        f_s_px = jnp.swapaxes(f_s_p, 1, 2)
        zp = ((0, 0), (_KPAD, _KPAD), (0, 0), (0, 0))
        return {
            "y": f_s,
            "x": f_s_x.reshape(b, h * w, self.dim),
            "py": f_s_p.reshape(b, h * w // 4, self.dim),
            "px": f_s_px.reshape(b, h * w // 4, self.dim),
            "xp": jnp.pad(f_s_x, zp).reshape(b, (w + 2 * _KPAD) * h, self.dim),
            "pxp": jnp.pad(f_s_px, zp).reshape(
                b, (w // 2 + 2 * _KPAD) * (h // 2), self.dim
            ),
        }

    def _build_levels(self, fd_sp, f_s_layouts, train):
        """Per-query 2-level correlation maps as einsums vs source features.

        The reference materializes the (4096, 4096) volume and avg_pools it
        (raft.py:176-208 + F.avg_pool2d per resolution). Both pyramid
        pooling (over source pixels) and driving-resolution pooling are
        LINEAR in the features, so each level is computed directly:
          level l at driving res r = pool_r(f_d) @ pool_{2^l}(f_s)^T
        — exact (mean of dot = dot of mean), and the x-major map layout the
        Pallas lookup wants falls out of x-major-permuted source features
        instead of a per-frame 67 MB transpose (the round-3 frame profile
        showed that cast/transpose/pool prep dominating async copy time).

        Args:
          fd_sp: (B, hq, wq, dim) (possibly driving-pooled) query features.
          f_s_layouts: dict with 'y'/'x' full-res and 'py'/'px' 2x2-pooled
            source features, each (B, n, dim).
          train: keeps maps in the compute dtype under remat (half-size
            saved residuals); serving emits f32 (the kernel's native dtype).

        Returns:
          (impl, map0, map1): lookup impl name and (B*nq, s, s) per-query
          maps in that impl's layout (x-major for pallas, y-major else).
        """
        b, hq, wq, dim = fd_sp.shape
        nq = hq * wq
        impl = self._resolve_lookup_impl(b * nq)
        # eval/serving: emit x-PADDED maps directly (the pad rows of the
        # x-major source features are zeros, so the einsum output is already
        # zero-padded on the sublane axis) — the Pallas kernel then needs no
        # per-query scratch copies at all (ops/pallas_kernels.py v3). The
        # training path keeps unpadded maps: its backward scatter kernel is
        # tuned for them and the padded stacks would grow the remat regions'
        # live intermediates at the reference batch 10.
        if impl == "pallas" and not train:
            impl = "pallas_pad"
        # fold the 1/sqrt(dim) volume scale into the (tiny) query features
        # instead of a broadcast-multiply over the (nq, 4096) maps — the
        # round-3 profile showed that multiply costing ~0.5 ms/frame
        fd = fd_sp.reshape(b, nq, dim) * self.scale
        # maps carry the compute dtype (bf16 under the serving/train policy):
        # the (b*nq, 4096) level-0 maps are the largest intermediates in the
        # whole frame step, and their write + kernel-read traffic halves in
        # bf16. Lookup selection is exact per-entry in any dtype (one-hot
        # dots), the bilinear blend accumulates in f32, and the consumer
        # (BasicMotionEncoder) is bf16 anyway; f32-policy runs (goldens,
        # MRFA_BENCH_DTYPE=f32) are unchanged.
        out_dt = fd.dtype
        if impl == "pallas_pad":
            s0, s1 = f_s_layouts["xp"], f_s_layouts["pxp"]
        elif impl == "pallas":
            s0, s1 = f_s_layouts["x"], f_s_layouts["px"]
        else:
            s0, s1 = f_s_layouts["y"], f_s_layouts["py"]
        c0 = jnp.einsum("bqc,bjc->bqj", fd, s0, preferred_element_type=out_dt)
        c1 = jnp.einsum("bqc,bjc->bqj", fd, s1, preferred_element_type=out_dt)
        from mrfa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, maybe_constrain

        # shard the query axis over 'model' (f_d row-sharded, f_s replicated:
        # no collective; downstream lookups touch only local query rows)
        c0 = maybe_constrain(c0, DATA_AXIS, MODEL_AXIS, None)
        c1 = maybe_constrain(c1, DATA_AXIS, MODEL_AXIS, None)
        from mrfa_tpu.ops.pallas_kernels import PAD as _KPAD

        p = 2 * _KPAD if impl == "pallas_pad" else 0
        map0 = c0.reshape(b * nq, self.h + p, self.w)
        map1 = c1.reshape(b * nq, self.h // 2 + p, self.w // 2)
        return impl, map0, map1

    def _lookup_levels(self, impl, map0, map1, coords):
        """Lookup over precomputed levels (all impls exact, tests/test_corr)."""
        if impl == "pallas_pad":
            from mrfa_tpu.ops.pallas_kernels import corr_block_lookup_pallas_padded

            return corr_block_lookup_pallas_padded(map0, map1, coords)
        if impl == "pallas":
            from mrfa_tpu.ops.pallas_kernels import corr_block_lookup_pallas_pret

            return corr_block_lookup_pallas_pret(map0, map1, coords)
        if impl == "xla":
            return corr_block_lookup_levels(map0, map1, coords)
        return corr_block_lookup_levels_gather(map0, map1, coords)

    def _warp_context(self, i: int, feature_i, coords):
        """Warp the generator feature and project to context channels.

        Under training remat the warp avoids the default patch4
        pre-expansion: img4 materializes a 4xC copy of the full-res
        feature map inside the backward replay — the single largest temp
        of the b=10 256px train step (it OOM'd by ~0.5 GB). The remat
        gather mode is `sampler.train_gather_mode()`: "patch" ((2,2,C)
        slice gather — one descriptor per sample, only a ~1.02x padded
        copy) by default; the round-5 b=10 profile showed the previous
        lean path's 4x row-gather descriptors dominating async-DMA time.
        """
        from mrfa_tpu.ops.sampler import train_gather_mode

        warped = sample_pixel(
            feature_i, coords, lean=train_gather_mode() if self.remat else False
        )
        return jax.nn.relu(self.to_context[i](warped))

    def _refine_iter(
        self,
        i: int,
        train: bool,
        impl: str,
        flow,
        occlusion,
        d_f_pre,
        d_occ_pre,
        map0,
        map1,
        q_d,
        f_s_layouts,
        feature_i,
        init_flow,
        init_occlusion,
        fuse_img=None,
    ):
        """One refinement iteration (resolution (size//32)*2^i).

        Packaged as a method so training can rematerialize whole iterations
        (`nn.remat` in __call__): every intra-iteration activation — the
        98-channel lookups, motion features, refine convs — is recomputed in
        the backward instead of living in HBM for the rest of the forward.

        Correlation levels come in one of two ways:
          - (map0, map1) precomputed and SHARED across the full-res
            iterations (eval/serving: one einsum for three iterations);
          - q_d + f_s_layouts with maps=None (training under remat: the
            levels are built INSIDE the checkpointed iteration, so the
            (b*4096, 64, 64) map stacks are recomputed in the backward —
            a ~0.2 ms einsum — instead of living in HBM across the whole
            forward, which cost ~2 GB padded at the reference batch 10).

        Only the small flow/occlusion carries cross the remat boundary;
        the per-scale feature warps happen in the decode tail (also
        remat'd), not here, so no full-res 64-channel outputs are saved
        per iteration either.
        """
        b = flow.shape[0]
        res = (self.size // 32) * (2**i)
        id_grid = coords_grid(res, res, dtype=flow.dtype)[None]

        if map0 is None:
            # build the levels inside the checkpointed region (training)
            if i < self.basic_res_index:
                fd_sp = avg_pool(q_d, 2 ** (self.basic_res_index - i))
            else:
                fd_sp = q_d
            impl, map0, map1 = self._build_levels(fd_sp, f_s_layouts, train)

        # -- query coords against the (driving-pooled) correlation levels --
        if i < self.basic_res_index:
            scale = float(2 ** (self.basic_res_index - i))
            flow_sample, id_grid_sample = flow, id_grid
        elif i == self.basic_res_index:
            scale = 1.0
            flow_sample, id_grid_sample = flow, id_grid
        else:
            scale = 1.0
            flow_sample = resize_bilinear(flow, self.h, align_corners=True) * (
                0.5 ** (i - self.basic_res_index)
            )
            id_grid_sample = coords_grid(self.h, self.w, dtype=flow.dtype)[None]

        hq = flow_sample.shape[1]
        coords = (flow_sample + id_grid_sample) * scale  # (B,hq,hq,2)
        corr = self._lookup_levels(impl, map0, map1, coords.reshape(-1, 2))
        corr = corr.reshape(b, hq, hq, -1)  # (B,hq,hq,98)
        if i > self.basic_res_index:
            corr = resize_bilinear(corr, res, align_corners=True)

        m_f = self.corr_enc(flow, corr)
        warp_img_out = None
        if fuse_img is not None:
            # final-iteration fusion (eval / non-remat train): the post-loop
            # image warp `sample_pixel(img_full, flow + id_grid)` uses the
            # SAME coordinates as this iteration's context warp (the last
            # iteration leaves `flow` unchanged — reference raft.py:302
            # warps by the pre-refinement flow), so one channel-concatenated
            # gather serves both. Saves a full 65 536-descriptor gather
            # stream + its blend per frame (~0.13 ms, round-5 profile).
            cf = feature_i.shape[-1]
            fused = jnp.concatenate(
                [feature_i, fuse_img.astype(feature_i.dtype)], axis=-1
            )
            warped = sample_pixel(fused, flow + id_grid, lean="img4")
            warp_f = jax.nn.relu(self.to_context[i](warped[..., :cf]))
            warp_img_out = warped[..., cf:]
        else:
            # context warp as its own nested remat region (training): the
            # warp's expanded patch image + gathered taps are the
            # iteration's largest temps at full res and need not coexist
            # with the conv stacks' replay
            warp_ctx = (
                nn.remat(type(self)._warp_context, static_argnums=(1,))
                if self.remat
                else type(self)._warp_context
            )
            warp_f = warp_ctx(self, i, feature_i, flow + id_grid)

        d_all, _ = self.refine(m_f, warp_f)
        d_flow = d_all[..., 0:2]
        d_occ = d_all[..., 2:3]
        flow_w = flow + d_flow
        occlusion = occlusion + d_occ

        # per-scale outputs: only the SMALL flow_w / occlusion logits leave
        # the checkpointed iteration; the 64-channel feature warps and the
        # coarse prior-flow branch live in the remat'd decode tail
        # (_warp_decode), so they are recomputed in the backward instead of
        # being saved at up to (b, 256, 256, 64) per iteration
        flow_w_out = flow_w
        occ_logits_out = occlusion

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
            flow_w_out, occ_logits_out, warp_img_out,
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
        # also hoist the permuted/padded correlation layouts of f_s — each
        # is per-clip-constant; rebuilding them per frame showed up as
        # relayout copy traffic in the S=8 serving byte profile
        return {
            "feature": tuple(feature),
            "f_s": f_s,
            "f_s_layouts": self._source_layouts(f_s, b, h, w),
        }

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
        from mrfa_tpu.precision import get_compute_dtype

        cd = get_compute_dtype()
        warp_img = grid_sample(
            img_full if cd is None else img_full.astype(cd),
            flow_res, align_corners=False,
        )
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
        q_d = self.kp_head(fe_d)  # (B, h, w, dim) driving query features

        # --- correlation pyramid levels, built per driving resolution ---
        # source-feature layouts are per-clip-constant: the serving cache
        # carries them precomputed (encode_source); the training/uncached
        # path builds them here per call
        if source_cache is not None and "f_s_layouts" in source_cache:
            f_s_layouts = source_cache["f_s_layouts"]
        else:
            f_s_layouts = self._source_layouts(f_s, b, h, w)
        # training under remat builds the levels INSIDE each checkpointed
        # iteration (recomputed in the backward, not stored — see
        # _refine_iter); eval/serving precomputes them here so the full-res
        # levels are built ONCE and shared by the last three iterations
        build_inside = self.remat and train
        levels: List[Any] = []
        full_levels = None
        if not build_inside:
            for i in range(self.total_iter):
                if i < self.basic_res_index:
                    f = 2 ** (self.basic_res_index - i)
                    # driving-pooled queries (exact: avg_pool commutes with
                    # the correlation dot; reference pools the volume,
                    # raft.py:230)
                    levels.append(
                        self._build_levels(avg_pool(q_d, f), f_s_layouts, train)
                    )
                else:
                    if full_levels is None:
                        full_levels = self._build_levels(q_d, f_s_layouts, train)
                    levels.append(full_levels)

        # --- prior motion initialization (normalized -> pixel flow) ---
        id_grid64 = coords_grid(h, w, dtype=dense_motion["deformation"].dtype)[None]
        init_flow = (h - 1) * (dense_motion["deformation"] + 1.0) / 2.0 - id_grid64
        init_occlusion = dense_motion["occlusion"]

        flow = resize_bilinear(init_flow, self.size // 32, align_corners=True) / 8.0
        occlusion = resize_bilinear(
            init_occlusion, self.size // 32, align_corners=True
        )

        out_flow_w: List[jnp.ndarray] = []
        out_occ_logits: List[jnp.ndarray] = []
        d_f_pre = None
        d_occ_pre = None

        # per-iteration rematerialization (training memory): i, train and the
        # lookup impl are static (args 1, 2, 3 counting self as 0)
        iter_fn = (
            nn.remat(type(self)._refine_iter, static_argnums=(1, 2, 3))
            if self.remat
            else type(self)._refine_iter
        )

        # warp the image in the compute dtype: the 256^2 gather is
        # descriptor-rate-bound and ~40% faster on bf16 rows (profile);
        # pixel values lose <0.4% — the geometry (coords) stays f32
        from mrfa_tpu.precision import get_compute_dtype

        cd = get_compute_dtype()
        img_cast = img_full if cd is None else img_full.astype(cd)

        warp_img = None
        for i in range(self.total_iter):
            if build_inside:
                # query count for this iteration: res^2 until the basic res,
                # then h^2 (coords are resampled to the basic grid)
                nq_i = min((self.size // 32) * 2**i, self.h) ** 2
                impl_i, map0_i, map1_i = (
                    self._resolve_lookup_impl(b * nq_i), None, None,
                )
            else:
                impl_i, map0_i, map1_i = levels[i]
            # last iteration outside remat: fuse the final image warp into
            # the context warp (same coords — see _refine_iter)
            fuse_img = (
                img_cast
                if (i == self.total_iter - 1 and not build_inside)
                else None
            )
            (
                flow, occlusion, d_f_pre, d_occ_pre,
                flow_w_i, occ_logits_i, warp_img_i,
            ) = iter_fn(
                self, i, train, impl_i, flow, occlusion, d_f_pre, d_occ_pre,
                map0_i, map1_i,
                q_d if build_inside else None,
                f_s_layouts if build_inside else None,
                feature[i], init_flow, init_occlusion, fuse_img,
            )
            out_flow_w.append(flow_w_i)
            out_occ_logits.append(occ_logits_i)
            if warp_img_i is not None:
                warp_img = warp_img_i

        # NB: matches the reference — the final warp uses the pre-refinement
        # flow of the last iteration (raft.py:302 uses `flow`, not `flow_w`)
        if warp_img is None:
            id_grid = coords_grid(self.size, self.size, dtype=flow.dtype)[None]
            warp_img = sample_pixel(img_cast, flow + id_grid)
        out_occlusion = [jax.nn.sigmoid(l) for l in out_occ_logits]
        decode_fn = (
            nn.remat(_warp_decode, static_argnums=(7, 8))
            if self.remat
            else _warp_decode
        )
        out = decode_fn(
            self.gen, [feature[i] for i in range(self.total_iter)],
            out_flow_w, out_occlusion, dense_motion["deformation"],
            dense_motion["occlusion"], warp_img, train, self.basic_res_index,
        )

        vis_occ = out_occlusion + [jax.nn.sigmoid(init_occlusion)]
        vis = [
            resize_bilinear(o, self.size, align_corners=True) for o in vis_occ
        ]
        occlusion_vis = jnp.concatenate(vis, axis=2)
        return out, warp_img, occlusion_vis
