"""Batched multi-stream animation serving (BASELINE config #5).

Many concurrent (source, driving-stream) animation sessions are served as one
batched, jitted per-frame step, optionally sharded over the 'data' axis of a
device mesh (streams ride ICI across chips). The per-stream state (source
image + its downsample, source keypoints, initial driving keypoints, motion
scale) is precomputed once per stream and stacked; each serve() call advances
every stream by one frame in a single device program.

Host decode should feed `frames` double-buffered; see data.dataset.BatchLoader
for the threaded prefetch pattern.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mrfa_tpu.animate import normalize_kp
from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample
from mrfa_tpu.parallel.mesh import batch_sharding, make_mesh


class StreamBatchState(struct.PyTreeNode):
    """Stacked per-stream animation state (leading axis = stream)."""

    source: jnp.ndarray  # (S, H, W, 3)
    img_down: jnp.ndarray  # (S, H/4, W/4, 3)
    kp_source: Dict[str, jnp.ndarray]
    kp_driving_initial: Dict[str, jnp.ndarray]
    scale: jnp.ndarray  # (S,)
    # per-clip-constant decoder source work (generator pyramid + f_s),
    # computed once at open_streams — the reference redoes it per frame
    source_cache: Any = None


class FormattedStreams:
    """A compile_streams() handle: the AOT executable plus its arguments
    already laid out in the executable's preferred (AUTO) formats.
    `frame_reformat` is a compiled identity program that lays out each
    incoming driving frame in the executable's required format."""

    def __init__(self, compiled, variables, state, frame_reformat):
        self.compiled = compiled
        self.variables = variables
        self.state = state
        self.frame_reformat = frame_reformat


class AnimationServer:
    def __init__(
        self,
        model: MRFA,
        variables: Dict[str, Any],
        mesh=None,
        relative: bool = True,
        use_relative_jacobian: bool = True,
    ):
        self.model = model
        # bf16-policy weight pre-pack (see Animator.__init__): bit-identical
        # to the in-program per-frame cast, done once at server init
        from mrfa_tpu.precision import cast_params_for_inference, get_compute_dtype

        cd = get_compute_dtype()
        self.variables = (
            cast_params_for_inference(variables, cd) if cd is not None else variables
        )
        self.mesh = mesh
        self.relative = relative
        self.use_relative_jacobian = use_relative_jacobian
        self._aa = AntiAliasParams.create(0.25)

        def encode(model, img):
            return model.encode_kp(img)

        self._encode = jax.jit(lambda v, img: model.apply(v, img, method=encode))

        def frame_step(model, source, img_down, kp_source, kp_d0, frames, scale,
                       source_cache):
            kp_driving = model.encode_kp(frames)
            kp_norm = normalize_kp(
                kp_source, kp_driving, kp_d0,
                adapt_movement_scale=scale[:, None, None],
                use_relative_movement=self.relative,
                use_relative_jacobian=self.relative and self.use_relative_jacobian,
            )
            dense_motion = model.run_dense_motion(
                source, kp_norm, kp_source, None, False, 0.0, False
            )
            out, _, _ = model.decoder(
                model.kp_for_decoder(kp_source),
                model.kp_for_decoder(kp_norm),
                dense_motion,
                img=img_down,
                img_full=source,
                train=False,
                source_cache=source_cache,
            )
            return out

        self._frame = jax.jit(
            lambda v, st, frames: model.apply(
                v, st.source, st.img_down, st.kp_source, st.kp_driving_initial,
                frames, st.scale, st.source_cache, method=frame_step,
            )
        )
        def chunk_step(model, source, img_down, kp_source, kp_d0, frames, scale,
                       source_cache):
            # statically unrolled K frames per stream in one dispatch
            # (frames: (K, S, H, W, 3)); identical per-frame work, amortizes
            # the per-step launch gap over the chunk. Unrolled, not scanned —
            # see Animator chunk_step for the measured scan penalty.
            outs = [
                frame_step(
                    model, source, img_down, kp_source, kp_d0, frames[k],
                    scale, source_cache,
                )
                for k in range(frames.shape[0])
            ]
            return jnp.stack(outs, 0)  # (K, S, H, W, 3)

        self._frame_chunk = jax.jit(
            lambda v, st, frames: model.apply(
                v, st.source, st.img_down, st.kp_source, st.kp_driving_initial,
                frames, st.scale, st.source_cache, method=chunk_step,
            )
        )
        self._encode_source = jax.jit(
            lambda v, src, kps, dwn: model.apply(
                v, src, kps, dwn,
                method=lambda m, s, k, d: m.encode_source_cache(s, k, d),
            )
        )

    def open_streams(
        self,
        sources: np.ndarray,  # (S, H, W, 3)
        first_frames: np.ndarray,  # (S, H, W, 3)
        adapt_movement_scale: bool = False,
    ) -> StreamBatchState:
        src = jnp.asarray(sources)
        if self.mesh is not None:
            src = jax.device_put(src, batch_sharding(self.mesh))
        kp_source = self._encode(self.variables, src)
        kp_d0 = self._encode(self.variables, jnp.asarray(first_frames))
        if adapt_movement_scale:
            from mrfa_tpu.animate import convex_hull_volume

            scales = []
            kps = np.asarray(kp_source["kp"])
            kpd = np.asarray(kp_d0["kp"])
            for s in range(src.shape[0]):
                sa = convex_hull_volume(kps[s])
                da = convex_hull_volume(kpd[s])
                scales.append(np.sqrt(sa) / np.sqrt(da))
            scale = jnp.asarray(scales, jnp.float32)
        else:
            scale = jnp.ones((src.shape[0],), jnp.float32)
        img_down = antialias_downsample(src, self._aa)
        return StreamBatchState(
            source=src,
            img_down=img_down,
            kp_source=kp_source,
            kp_driving_initial=kp_d0,
            scale=scale,
            source_cache=self._encode_source(
                self.variables, src, kp_source, img_down
            ),
        )

    def serve(self, state: StreamBatchState, frames: np.ndarray) -> jnp.ndarray:
        """Advance every stream one frame: (S,H,W,3) driving -> (S,H,W,3) out."""
        f = jnp.asarray(frames)
        if self.mesh is not None:
            f = jax.device_put(f, batch_sharding(self.mesh))
        return self._frame(self.variables, state, f)

    def compile_streams(self, state: StreamBatchState) -> "FormattedStreams":
        """AOT-compile the frame step with compiler-chosen (AUTO) input
        layouts and move the weights + per-clip stream state into those
        layouts ONCE.

        The jit path device_puts arguments in default layouts; when the
        executable prefers tiled/transposed layouts XLA inserts relayout
        copies INSIDE the program, re-paid every frame — at S=8 the device
        profile shows ~40% of op time in such copy-starts, led by the
        per-clip source cache. Pre-formatting is the serving analogue of
        weight pre-packing in an inference runtime. Single-host path (the
        mesh path shards by stream; formats there follow GSPMD).
        """
        if self.mesh is not None:
            raise NotImplementedError("preformatting rides single-chip serving")
        from jax.experimental.layout import Format, Layout

        dummy = jnp.zeros_like(state.source)
        # Pass 1 — let the compiler SOLVE its preferred input layouts.
        # jit-of-jit inlines the traced step under the AUTO-layout wrapper.
        step = lambda v, st, f: self._frame(v, st, f)  # noqa: E731
        auto = jax.jit(step, in_shardings=Format(Layout.AUTO))
        compiled = auto.lower(self.variables, state, dummy).compile()
        var_fmt, state_fmt, frame_fmt = compiled.input_formats[0]

        # Pass 2 — lay the arguments out with a COMPILED identity program
        # whose out_shardings are the solved formats. `device_put` is not
        # trustworthy here: on the axon TPU PJRT backend it silently drifts
        # from the requested layout (wrong minor-dim tiling) for ~10 leaf
        # shapes, and the drifted buffers either fail the executable's
        # layout check or, when recompiled-around, abort in the backend.
        # XLA-produced outputs carry exactly their declared layouts.
        reformat = (
            jax.jit(lambda v, st: (v, st), out_shardings=(var_fmt, state_fmt))
            .lower(self.variables, state)
            .compile()
        )
        f_vars, f_state = reformat(self.variables, state)
        frame_reformat = (
            jax.jit(lambda f: f, out_shardings=frame_fmt).lower(dummy).compile()
        )
        return FormattedStreams(
            compiled=compiled,
            variables=f_vars,
            state=f_state,
            frame_reformat=frame_reformat,
        )

    def serve_formatted(self, fs: "FormattedStreams", frames) -> jnp.ndarray:
        """serve() through a compile_streams() handle — no in-program
        relayout copies; the driving frame is re-laid-out by one compiled
        identity program (a plain copy when the compiler keeps the default
        frame layout)."""
        f = fs.frame_reformat(jnp.asarray(frames))
        return fs.compiled(fs.variables, fs.state, f)

    def serve_chunk(self, state: StreamBatchState, frames: np.ndarray) -> jnp.ndarray:
        """Advance every stream K frames: (K,S,H,W,3) -> (K,S,H,W,3) out.

        One dispatch scans the chunk on device — per-frame work identical to
        serve(); trades K frames of latency for launch-gap amortization.
        """
        f = jnp.asarray(frames)
        if self.mesh is not None:
            # chunk axis leads; streams (axis 1) ride the data axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mrfa_tpu.parallel.mesh import DATA_AXIS

            f = jax.device_put(f, NamedSharding(self.mesh, P(None, DATA_AXIS)))
        return self._frame_chunk(self.variables, state, f)
