"""Animation API: relative-motion keypoint normalization + frame loops.

Public serving surface matching /root/reference/demo.py:30-73 and
animate_ddp.py:17-37: `normalize_kp` relative-motion transfer and
`make_animation` over a driving clip, decomposed (like the reference) into
kp-encoder / dense-motion / decoder stages.

TPU-native serving design: the whole per-frame pipeline — driving keypoint
encoding, relative normalization, dense motion, RaftFlow refinement, decode —
is ONE jitted function (single host->device->host round trip per frame);
source-side keypoints are hoisted out of the loop. The reference re-runs
dense_motion per frame and syncs repeatedly (demo.py:55-72).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample


def convex_hull_volume(points: np.ndarray) -> float:
    from scipy.spatial import ConvexHull

    return float(ConvexHull(points).volume)


def normalize_kp(
    kp_source: Dict[str, jnp.ndarray],
    kp_driving: Dict[str, jnp.ndarray],
    kp_driving_initial: Dict[str, jnp.ndarray],
    adapt_movement_scale=False,
    use_relative_movement: bool = False,
    use_relative_jacobian: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Relative-motion transfer: kp_new = kp_s + (kp_d - kp_d0) * scale.

    `adapt_movement_scale` may be a bool (True computes the convex-hull area
    ratio on host, matching the reference) or a precomputed float scale.
    """
    if isinstance(adapt_movement_scale, bool):
        if adapt_movement_scale:
            source_area = convex_hull_volume(np.asarray(kp_source["kp"])[0])
            driving_area = convex_hull_volume(np.asarray(kp_driving_initial["kp"])[0])
            scale = np.sqrt(source_area) / np.sqrt(driving_area)
        else:
            scale = 1.0
    else:
        scale = adapt_movement_scale

    kp_new = dict(kp_driving)
    if use_relative_movement:
        kp_diff = (kp_driving["kp"] - kp_driving_initial["kp"]) * scale
        kp_new["kp"] = kp_diff + kp_source["kp"]
        if use_relative_jacobian and "jacobian" in kp_driving:
            jacobian_diff = jnp.matmul(
                kp_driving["jacobian"], jnp.linalg.inv(kp_driving_initial["jacobian"])
            )
            kp_new["jacobian"] = jnp.matmul(jacobian_diff, kp_source["jacobian"])
    return kp_new


class Animator:
    """Fused, jitted per-frame animation pipeline over a trained MRFA model."""

    def __init__(
        self,
        model: MRFA,
        variables: Dict[str, Any],
        relative: bool = True,
        use_relative_jacobian: bool = True,
    ):
        self.model = model
        # pre-cast the compute-dtype conv/dense kernels ONCE under the bf16
        # policy: bit-identical to the per-call cast flax would do inside
        # the frame program, but the f32 weight reads + cast copy chains
        # leave the per-frame step (the S=1 device profile showed them as
        # the largest class of per-frame copy traffic)
        from mrfa_tpu.precision import cast_params_for_inference, get_compute_dtype

        cd = get_compute_dtype()
        self.variables = (
            cast_params_for_inference(variables, cd) if cd is not None else variables
        )
        self.relative = relative
        self.use_relative_jacobian = use_relative_jacobian
        self._aa = AntiAliasParams.create(0.25)

        def encode(model, img):
            return model.encode_kp(img)

        self._encode = jax.jit(
            lambda v, img: model.apply(v, img, method=encode)
        )

        def frame_step(model, source, img_down, kp_source, kp_driving_initial,
                       driving_frame, scale, source_cache):
            kp_driving = model.encode_kp(driving_frame)
            kp_norm = normalize_kp(
                kp_source, kp_driving, kp_driving_initial,
                adapt_movement_scale=scale,
                use_relative_movement=self.relative,
                use_relative_jacobian=self.relative and self.use_relative_jacobian,
            )
            dense_motion = model.run_dense_motion(
                source, kp_norm, kp_source, None, False, 0.0, False
            )
            out, warp_img, occlusion = model.decoder(
                model.kp_for_decoder(kp_source),
                model.kp_for_decoder(kp_norm),
                dense_motion,
                img=img_down,
                img_full=source,
                train=False,
                source_cache=source_cache,
            )
            return out, warp_img, occlusion

        self._frame = jax.jit(
            lambda v, src, dwn, kps, kpd0, frame, scale, cache: model.apply(
                v, src, dwn, kps, kpd0, frame, scale, cache, method=frame_step
            )
        )

        def chunk_step(model, source, img_down, kp_source, kp_driving_initial,
                       frames, scale, source_cache):
            # statically unrolled loop over the chunk's frame axis: identical
            # per-frame work, ONE dispatch for K frames — removes the
            # per-frame host->device launch gap of the frame-by-frame loop
            # (the reference's demo.py loop pays it per frame). Unrolled, not
            # lax.scan: a scanned body pins loop-carried layouts and gags the
            # latency-hiding scheduler (measured 2.5x SLOWER than per-frame
            # dispatch on v5e); unrolling keeps the flat-graph schedule and
            # lets consecutive frames' ops overlap. Compile time scales with
            # K — keep chunks small (4-8).
            outs = []
            for k in range(frames.shape[0]):
                out, _, _ = frame_step(
                    model, source, img_down, kp_source, kp_driving_initial,
                    frames[k], scale, source_cache,
                )
                outs.append(out)
            return jnp.stack(outs, 0)  # (K, B, H, W, 3)

        self._frame_chunk = jax.jit(
            lambda v, src, dwn, kps, kpd0, frames, scale, cache: model.apply(
                v, src, dwn, kps, kpd0, frames, scale, cache, method=chunk_step
            )
        )
        # per-clip-constant decoder source work (generator pyramid + f_s) —
        # the reference recomputes this every frame (demo.py:55-72)
        self._encode_source = jax.jit(
            lambda v, src, kps, dwn: model.apply(
                v, src, kps, dwn,
                method=lambda m, s, k, d: m.encode_source_cache(s, k, d),
            )
        )

    def encode_kp(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self._encode(self.variables, image)

    def begin(self, source_image: np.ndarray, first_driving_frame: np.ndarray,
              adapt_movement_scale: bool = False):
        """Per-clip setup: source keypoints, initial driving keypoints, scale."""
        source = jnp.asarray(source_image)
        if source.ndim == 3:
            source = source[None]
        kp_source = self.encode_kp(source)
        kp_d0 = self.encode_kp(jnp.asarray(first_driving_frame)[None])
        if adapt_movement_scale:
            sa = convex_hull_volume(np.asarray(kp_source["kp"])[0])
            da = convex_hull_volume(np.asarray(kp_d0["kp"])[0])
            scale = float(np.sqrt(sa) / np.sqrt(da))
        else:
            scale = 1.0
        img_down = antialias_downsample(source, self._aa)
        cache = self._encode_source(self.variables, source, kp_source, img_down)
        return source, img_down, kp_source, kp_d0, jnp.float32(scale), cache

    def animate_frame(self, clip_state, driving_frame):
        source, img_down, kp_source, kp_d0, scale, cache = clip_state
        frame = jnp.asarray(driving_frame)
        if frame.ndim == 3:
            frame = frame[None]
        return self._frame(
            self.variables, source, img_down, kp_source, kp_d0, frame, scale,
            cache,
        )

    def animate_chunk(self, clip_state, driving_frames):
        """Animate K frames in one device dispatch: (K, H, W, 3) -> (K, B, H, W, 3).

        Per-frame work is identical to `animate_frame` (scanned on device);
        use for offline clips or streamed serving that can afford K frames of
        latency. All chunks of the same K share one compiled program.
        """
        source, img_down, kp_source, kp_d0, scale, cache = clip_state
        frames = jnp.asarray(driving_frames)
        if frames.ndim == 4:
            frames = frames[:, None]  # (K, 1, H, W, 3)
        return self._frame_chunk(
            self.variables, source, img_down, kp_source, kp_d0, frames, scale,
            cache,
        )

    def make_animation(
        self,
        source_image: np.ndarray,  # (H, W, 3) in [0, 1]
        driving_video: np.ndarray,  # (T, H, W, 3)
        adapt_movement_scale: bool = False,
        chunk: int = 1,
    ) -> List[np.ndarray]:
        clip_state = self.begin(source_image, driving_video[0], adapt_movement_scale)
        predictions = []
        t = 0
        n = len(driving_video)
        while t < n:
            if chunk > 1 and n - t >= chunk:
                outs = self.animate_chunk(
                    clip_state, np.asarray(driving_video[t : t + chunk])
                )
                predictions.extend(np.asarray(outs[:, 0]))
                t += chunk
            else:
                out, _, _ = self.animate_frame(clip_state, driving_video[t])
                predictions.append(np.asarray(out[0]))
                t += 1
        return predictions

    def find_best_frame(self, source_image: np.ndarray, driving_video: np.ndarray) -> int:
        """Driving frame whose pose best matches the source.

        The reference's variant depends on an external face_alignment model
        (and its caller is broken, /root/reference/demo.py:150-157); here the
        model's own keypoint detector provides the pose distance — no extra
        dependency, same intent: the best frame anchors relative animation.
        """
        kp_source = self.encode_kp(jnp.asarray(source_image)[None])["kp"]
        kp_source = np.asarray(kp_source)[0]
        best, best_idx = float("inf"), 0
        for i, frame in enumerate(driving_video):
            kp = np.asarray(self.encode_kp(jnp.asarray(frame)[None])["kp"])[0]
            d = float(np.sum((kp - kp_source) ** 2))
            if d < best:
                best, best_idx = d, i
        return best_idx

    def make_animation_from_best_frame(
        self,
        source_image: np.ndarray,
        driving_video: np.ndarray,
        adapt_movement_scale: bool = False,
    ) -> List[np.ndarray]:
        """Animate forward and backward from the best-matching frame."""
        i = self.find_best_frame(source_image, driving_video)
        forward = driving_video[i:]
        backward = driving_video[: i + 1][::-1]
        preds_fwd = self.make_animation(source_image, forward, adapt_movement_scale)
        preds_bwd = self.make_animation(source_image, backward, adapt_movement_scale)
        return preds_bwd[::-1] + preds_fwd[1:]
