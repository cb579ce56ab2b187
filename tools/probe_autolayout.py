"""A/B the serving frame step against an AUTO-input-layout AOT compile.

The round-3 frame profile (tools/profile_frame.py) shows the dominant
copy-start ops re-laying-out conv weights and clip-state tensors every frame:
the jitted executable wants non-default layouts and XLA inserts in-graph
copies from the standard layouts device_put produces. Compiling with
Format(Layout.AUTO) lets the compiler pick the input layouts it wants, and
device_put-ing the per-clip constants (weights, source cache, kp dicts) into
`compiled.input_formats` ONCE moves that relayout cost out of the frame loop
entirely — the serving-framework analogue of weight pre-formatting.

Prints base fps, auto-layout fps, and output equality.

MEASURED (v5e, same-session A/B): base 84.4 fps, auto-layout 86.4 fps —
+2.4% only. The weight-relayout copy-starts in the profile are almost fully
hidden under compute by the latency-hiding scheduler; input layouts are NOT
the frame step's bottleneck. Kept as the recipe for weight pre-formatting
should a future model variant become relayout-bound.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.animate import Animator
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
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    animator = Animator(model, variables, relative=True)

    src = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
    kp_source = animator._encode(animator.variables, src)
    frames = [
        jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32)) for _ in range(8)
    ]
    kp_d0 = animator._encode(animator.variables, frames[0])
    scale = jnp.float32(1.0)
    cache = animator._encode_source(animator.variables, src, kp_source, img_down)
    args = (animator.variables, src, img_down, kp_source, kp_d0, frames[0], scale, cache)

    # --- base: the frame step AOT-compiled with DEFAULT layouts ---
    # (same AOT call path as the auto variant below, so the A/B isolates the
    # layout effect from Python jit-dispatch overhead)
    base_compiled = animator._frame.lower(*args).compile()
    out, _, _ = base_compiled(*args)
    base0 = np.asarray(out)
    n = 60
    bargs = list(args)
    t0 = time.perf_counter()
    for i in range(n):
        bargs[5] = frames[i % len(frames)]
        out, _, _ = base_compiled(*bargs)
    _ = np.asarray(out)
    base_fps = n / (time.perf_counter() - t0)
    print(f"base:        {base_fps:6.2f} fps", flush=True)

    # --- AUTO input layouts, AOT-compiled ---
    # jit-of-jit inlines the inner jaxpr, so wrapping the existing jitted
    # frame step gives the same graph under AUTO layouts
    from jax.experimental.layout import Format, Layout

    auto_frame = jax.jit(
        lambda v, s, d, ks, k0, f, sc, c: animator._frame(v, s, d, ks, k0, f, sc, c),
        in_shardings=Format(Layout.AUTO),
        out_shardings=Format(Layout.AUTO),
    )
    t0 = time.perf_counter()
    compiled = auto_frame.lower(*args).compile()
    print(f"auto compile: {time.perf_counter() - t0:.1f}s", flush=True)
    fmts = compiled.input_formats[0]  # (arg_formats, kwarg_formats)
    fargs = [jax.device_put(a, f) for a, f in zip(args, fmts)]
    fframes = [jax.device_put(f, fmts[5]) for f in frames]
    out, _, _ = compiled(*fargs)
    auto0 = np.asarray(out)
    t0 = time.perf_counter()
    for i in range(n):
        fargs[5] = fframes[i % len(fframes)]
        out, _, _ = compiled(*fargs)
    _ = np.asarray(out)
    auto_fps = n / (time.perf_counter() - t0)
    print(f"auto-layout: {auto_fps:6.2f} fps", flush=True)
    diff = float(
        np.abs(
            np.asarray(base0, np.float32) - np.asarray(auto0, np.float32)
        ).max()
    )
    tol = 1e-2 if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16" else 1e-5
    verdict = "PASS" if diff < tol else "FAIL"
    print(f"max_abs_diff vs base: {diff:.3e} ({verdict}, tol {tol:g})", flush=True)
    if diff >= tol:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
