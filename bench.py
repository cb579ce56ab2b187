"""Benchmark: 256px single-stream animation frames/sec on one TPU chip.

Measures the full per-frame serving step of the flagship (MTIA prior) model —
driving keypoint encoding + relative normalization + dense motion + 6-step
RaftFlow refinement + generator decode — matching the reference's demo loop
work (/root/reference/demo.py:55-72), as one fused jitted function dispatched
per frame (pipelined dispatches are device-bound on v5e); `chunk_fps` reports
the K-frames-per-dispatch serving variant (identical per-frame work,
tests/test_animate.py).

MEASUREMENT HONESTY (round-2 fix): through the axon dev tunnel,
`jax.block_until_ready` returns when work is *scheduled*, not when the device
has executed it — timing dispatch rates instead of execution. (Round-1's
570-623 fps numbers were this artifact; verified by chaining steps inside a
single jit: the true rate matched the value-fetch rate, ~20 fps bf16 at
round-2 start.) This bench therefore times N in-order dispatches and then
fetches the LAST output's value: device execution is in-order, so the final
value transfer bounds completion of all N steps.

Serving precision is bf16 compute / f32 geometry (mrfa_tpu/precision.py,
tested to <2% output delta). MRFA_BENCH_DTYPE=f32 for full precision.

Baseline note: the reference publishes no frames/sec (BASELINE.md). The
north-star target is >= 2x an A100's single-stream fps; an A100 running the
PyTorch reference at 256px is ESTIMATED at ~45 fps, so vs_baseline is
reported against 90 fps (see PARITY.md caveats).

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 90.0  # 2 x estimated A100 single-stream fps (see docstring)
PEAK_FLOPS_BF16 = 197e12  # TPU v5e (device_kind "TPU v5 lite")
PEAK_FLOPS_F32 = 98.5e12  # ~half the bf16 MXU rate


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    dtype_flag = os.environ.get("MRFA_BENCH_DTYPE", "bf16")
    if dtype_flag == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.animate import Animator
    from mrfa_tpu.models.mrfa import MRFA

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

    # jit the init: eager init is thousands of tiny ops (minutes over the
    # dev-env device tunnel); one compiled graph takes seconds
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

    animator = Animator(model, variables, relative=True)
    source = rng.rand(1, size, size, 3).astype(np.float32)

    # per-clip setup (hoisted out of the frame loop, as in serving):
    # source keypoints, 0.25x downsample, and the decoder's source cache
    # (generator pyramid + f_s — recomputed per frame by the reference)
    src = jnp.asarray(source)
    img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
    kp_source = animator._encode(animator.variables, src)
    frames = [
        jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
        for _ in range(8)
    ]
    kp_d0 = animator._encode(animator.variables, frames[0])
    scale = jnp.float32(1.0)
    cache = animator._encode_source(animator.variables, src, kp_source, img_down)

    # frame-step FLOPs from XLA's cost model (for the MFU estimate;
    # validated exact on plain matmuls against the analytic count)
    flops_per_frame = None
    try:
        lowered = animator._frame.lower(
            animator.variables, src, img_down, kp_source, kp_d0,
            frames[0], scale, cache,
        )
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_per_frame = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    def step(frame):
        return animator._frame(
            animator.variables, src, img_down, kp_source, kp_d0, frame, scale,
            cache,
        )

    # --- on-hardware Pallas exactness gate (VERDICT r2 item 6) ---
    # CI can only run the kernels in interpret mode; this compares the
    # compiled Mosaic lowering against the gather oracle (fwd + vjp) on the
    # real chip before any timing, so a silent lowering regression cannot
    # hide behind a plausible fps number.
    from mrfa_tpu.ops.corr import corr_block_lookup
    from mrfa_tpu.ops.pallas_kernels import (
        PAD as KPAD,
        corr_block_lookup_pallas_padded,
        corr_block_lookup_pallas_pret,
    )
    from mrfa_tpu.ops.resize import avg_pool

    def corr_block_lookup_pallas(corr, coords):
        # training path: pre-transposed levels (models/raft.py builds them
        # as einsums); wrapping the transpose/pool here lets jax.vjp cover
        # the pret forward AND backward kernels against the gather oracle
        c0t = jnp.transpose(corr[..., 0], (0, 2, 1))
        c1t = jnp.transpose(avg_pool(corr, 2)[..., 0], (0, 2, 1))
        return corr_block_lookup_pallas_pret(c0t, c1t, coords)

    def corr_block_lookup_padded(corr, coords):
        # serving/eval production path: pre-PADDED x-major levels (v3 kernel)
        zp = ((0, 0), (KPAD, KPAD), (0, 0))
        c0p = jnp.pad(jnp.transpose(corr[..., 0], (0, 2, 1)), zp)
        c1p = jnp.pad(jnp.transpose(avg_pool(corr, 2)[..., 0], (0, 2, 1)), zp)
        return corr_block_lookup_pallas_padded(c0p, c1p, coords)

    ex_corr = jnp.asarray(rng.randn(512, 64, 64, 1).astype(np.float32))
    ex_coords = jnp.asarray(
        np.stack(
            [rng.uniform(-8, 72, 512), rng.uniform(-8, 72, 512)], -1
        ).astype(np.float32)
    )
    ex_g = jnp.asarray(rng.randn(512, 98).astype(np.float32))

    def _lk(fn):
        out, vjp = jax.vjp(fn, ex_corr, ex_coords)
        dcorr, dcoords = vjp(ex_g)
        return jax.device_get((out, dcorr, dcoords))

    want = _lk(corr_block_lookup)
    lookup_exactness = 0.0
    for fn in (corr_block_lookup_pallas, corr_block_lookup_padded):
        got = _lk(fn)
        err = float(max(np.abs(g - w).max() for g, w in zip(got, want)))
        lookup_exactness = max(lookup_exactness, err)
        if err > 1e-4:
            raise AssertionError(
                f"Pallas lookup ({fn.__name__}) diverges from the gather "
                f"oracle on hardware: max_abs_err={err}"
            )

    # the warp-backward splat kernel (production training path via
    # _splat_dispatch at n >= 2048) vs the XLA matmul splat, compiled on
    # the real chip in both production dtypes — interpret-mode tests can't
    # see a Mosaic lowering regression (ADVICE r4)
    from mrfa_tpu.ops.pallas_splat import splat_pallas
    from mrfa_tpu.ops.sampler import _splat

    splat_exactness = 0.0
    for dt in (np.float32, jnp.bfloat16):
        bs, ns, hs, ws, cs_ = 2, 4096, 64, 64, 64
        gs = jnp.asarray(rng.randn(bs, ns, cs_).astype(np.float32)).astype(dt)
        ys = jnp.asarray(rng.randint(-1, hs + 1, (bs, ns)).astype(np.int32))
        xs = jnp.asarray(rng.randint(-1, ws + 1, (bs, ns)).astype(np.int32))
        wls = [
            jnp.asarray(rng.rand(bs, ns).astype(np.float32)) for _ in range(4)
        ]
        want_s = np.asarray(
            _splat(gs, ys, wls[0], wls[1], xs, wls[2], wls[3], hs, ws)
        )
        got_s = np.asarray(
            splat_pallas(gs, ys, wls[0], wls[1], xs, wls[2], wls[3], hs, ws)
        )
        err = float(np.abs(got_s - want_s).max() / (np.abs(want_s).max() + 1e-8))
        splat_exactness = max(splat_exactness, err)
        if err > 1e-4:
            raise AssertionError(
                f"Pallas splat diverges from the XLA splat on hardware "
                f"(dtype={dt}): max_rel_err={err}"
            )

    out, _, _ = step(frames[0])  # warmup / compile
    _ = np.asarray(out)  # value fetch = true completion

    n_iters = 60
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, _, _ = step(frames[i % len(frames)])
    # device execution is in-order: materializing the LAST output's value
    # bounds completion of all n_iters steps (block_until_ready alone lies
    # through the tunnel — see module docstring)
    checksum = float(np.asarray(out).mean())
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    # secondary: the chunked animation step (Animator.animate_chunk) — K
    # frames per dispatch, per-frame work identical (tests/test_animate.py
    # asserts equality). Measured on v5e the pipelined per-frame dispatch is
    # already device-bound (no host gap to amortize), so this is reported
    # for the serving surface rather than as the headline.
    K = int(os.environ.get("MRFA_BENCH_CHUNK", "4"))
    chunk = jnp.stack(frames[:K] * (K // len(frames) + 1), 0)[:K]  # (K,1,H,W,3)
    outs = animator._frame_chunk(
        animator.variables, src, img_down, kp_source, kp_d0, chunk, scale, cache
    )
    _ = np.asarray(outs)  # warmup / compile
    n_chunks = max(1, 64 // K)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        outs = animator._frame_chunk(
            animator.variables, src, img_down, kp_source, kp_d0, chunk, scale,
            cache,
        )
    checksum_ch = float(np.asarray(outs[-1]).mean())
    dt = time.perf_counter() - t0
    chunk_fps = n_chunks * K / dt

    result = {
        "metric": "animation_fps_256px",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "dtype": dtype_flag,
        "chunk_fps": round(chunk_fps, 2),
        "chunk": K,
        "checksum": round(checksum, 4),
        "checksum_chunk": round(checksum_ch, 4),
        "lookup_exactness": lookup_exactness,
        "splat_exactness": splat_exactness,
    }
    if flops_per_frame:
        # pick the peak-FLOPs denominator matching the bench dtype so the
        # reported MFU is self-consistent (f32 runs use the ~half-rate peak)
        peak = PEAK_FLOPS_BF16 if dtype_flag == "bf16" else PEAK_FLOPS_F32
        result["flops_per_frame"] = round(flops_per_frame)
        result["mfu"] = round(flops_per_frame * fps / peak, 4)
        result["peak_flops"] = peak
    print(json.dumps(result))


if __name__ == "__main__":
    main()
