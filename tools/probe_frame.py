"""Device-time decomposition of the 256px serving frame step (bf16).

Uses the scan-chain methodology (tools/probe_device_time.py): K dependent
iterations inside one jit; device ms/op = (T(21) - T(1)) / 20. Pieces:
  encode_kp     — MTIA driving-frame encoder (HRNet-W32 + 12-layer ViT)
  dense_motion  — DenseMotionNetwork at 64px
  decoder       — RaftFlow (gen encode + corr volume + 6 refinements + decode)
  frame (full)  — the production Animator frame step
"""
from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()
    from mrfa_tpu.animate import Animator, normalize_kp
    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

    size = 256
    cfg = _flagship_cfg(size)
    model = MRFA(cfg)
    rng = np.random.RandomState(0)
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    import functools

    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    animator = Animator(model, variables, relative=True)

    src = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    frame0 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
    kp_source = animator._encode(animator.variables, src)
    kp_d0 = animator._encode(animator.variables, frame0)
    scale = jnp.float32(1.0)

    def wall(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        return (time.perf_counter() - t0) / reps

    def report(name, make_scan):
        t1 = wall(make_scan(1), frame0)
        tk = wall(make_scan(21), frame0)
        print(f"{name:22s}: {(tk - t1) / 20 * 1e3:8.3f} ms/op device", flush=True)

    def dep(frame, out):
        # scalar chain dependency without changing values meaningfully
        return frame + 1e-30 * jnp.mean(out).astype(frame.dtype)

    # --- full frame step (mirrors Animator.frame_step) ---
    def frame_step(model, source, dwn, kps, kpd0, driving_frame, sc, cache):
        kp_driving = model.encode_kp(driving_frame)
        kp_norm = normalize_kp(
            kps, kp_driving, kpd0, adapt_movement_scale=sc,
            use_relative_movement=True, use_relative_jacobian=True,
        )
        dm = model.run_dense_motion(source, kp_norm, kps, None, False, 0.0, False)
        out, _, _ = model.decoder(
            model.kp_for_decoder(kps), model.kp_for_decoder(kp_norm), dm,
            img=dwn, img_full=source, train=False, source_cache=cache,
        )
        return out

    source_cache = animator._encode_source(
        animator.variables, src, kp_source, img_down
    )

    def _make_full(cache):
        def make(k):
            @jax.jit
            def run(frame):
                def body(f, _):
                    out = model.apply(
                        animator.variables, src, img_down, kp_source, kp_d0, f,
                        scale, cache, method=frame_step,
                    )
                    return dep(f, out), ()
                f, _ = jax.lax.scan(body, frame, None, length=k)
                return jnp.sum(f)
            return run
        return make

    make_full = _make_full(None)
    make_full_cached = _make_full(source_cache)

    # --- encode_kp on the driving frame ---
    def make_encode(k):
        @jax.jit
        def run(frame):
            def body(f, _):
                kp = model.apply(
                    animator.variables, f, method=lambda m, img: m.encode_kp(img)
                )
                return dep(f, kp["kp"]), ()
            f, _ = jax.lax.scan(body, frame, None, length=k)
            return jnp.sum(f)
        return run

    # --- dense motion ---
    kp_norm = normalize_kp(
        kp_source, kp_d0, kp_d0, adapt_movement_scale=scale,
        use_relative_movement=True, use_relative_jacobian=True,
    )

    def make_dm(k):
        @jax.jit
        def run(frame):
            def body(f, _):
                src_f = src + 1e-30 * jnp.mean(f).astype(src.dtype)
                dm = model.apply(
                    animator.variables, src_f, kp_norm, kp_source, None,
                    False, 0.0, False,
                    method=lambda m, *a: m.run_dense_motion(*a),
                )
                return dep(f, dm["deformation"]), ()
            f, _ = jax.lax.scan(body, frame, None, length=k)
            return jnp.sum(f)
        return run

    # --- decoder (RaftFlow) ---
    dm0 = model.apply(
        animator.variables, src, kp_norm, kp_source, None, False, 0.0, False,
        method=lambda m, *a: m.run_dense_motion(*a),
    )

    def dec_method(m, ks, kd, dmm, img, img_full, train):
        out, _, _ = m.decoder(
            m.kp_for_decoder(ks), m.kp_for_decoder(kd), dmm,
            img=img, img_full=img_full, train=train,
        )
        return out

    def make_dec(k):
        @jax.jit
        def run(frame):
            def body(f, _):
                src_f = src + 1e-30 * jnp.mean(f).astype(src.dtype)
                out = model.apply(
                    animator.variables, kp_source, kp_norm, dm0, img_down,
                    src_f, False, method=dec_method,
                )
                return dep(f, out), ()
            f, _ = jax.lax.scan(body, frame, None, length=k)
            return jnp.sum(f)
        return run

    # --- prior_only decoder: generator encode + per-scale warps + decode,
    # no corr volume / refinement loop (same params, unused subtrees idle) ---
    import copy

    cfg_po = copy.deepcopy(cfg)
    cfg_po["raft_flow"]["prior_only"] = True
    model_po = MRFA(cfg_po)

    def make_dec_po(k):
        @jax.jit
        def run(frame):
            def body(f, _):
                src_f = src + 1e-30 * jnp.mean(f).astype(src.dtype)
                out = model_po.apply(
                    animator.variables, kp_source, kp_norm, dm0, img_down,
                    src_f, False, method=dec_method,
                )
                return dep(f, out), ()
            f, _ = jax.lax.scan(body, frame, None, length=k)
            return jnp.sum(f)
        return run

    report("encode_kp (MTIA)", make_encode)
    report("dense_motion", make_dm)
    report("dec gen-only (prior)", make_dec_po)
    report("decoder (RaftFlow)", make_dec)
    # the 21-length full-frame scan graph exceeds the axon tunnel's
    # remote_compile request-size limit (HTTP 413); skippable — the full
    # frame is what bench.py measures directly
    if os.environ.get("MRFA_PROBE_FULL", "0") == "1":
        report("frame (full)", make_full)
        report("frame (src-cached)", make_full_cached)


if __name__ == "__main__":
    main()
