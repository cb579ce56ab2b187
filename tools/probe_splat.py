"""Time warp-backward (d_image splat) formulations on the chip.

The train-step profile (tools/profile_train.py) shows the vjp of the warp
gathers lowering to serialized per-sample XLA scatter while-loops (~670 ms
per warp at (10,128,128,32)/16k samples — 4 us/sample). Candidates:

  a) autodiff of the take_along_axis 4C-row gather (status quo; while-loop)
  b) autodiff of the lax.gather (2,2,C) patch path (pre-patch4; scatter too)
  c) chunked dense einsum splat: d_img = einsum('bny,bnx,bnc->byxc') with
     the one-hot-pair y/x weight matrices, N chunked to bound the
     (B,chunk,W,C) intermediate
  d) full dense einsum splat (no chunking) — memory permitting

All exact vs (a); honest value-fetch timing.

Usage: python tools/probe_splat.py [B H W C] (default 10 128 128 32)
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

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops.sampler import sample_pixel

    args = [int(a) for a in sys.argv[1:]] or [10, 128, 128, 32]
    b, h, w, c = args
    n = h * w  # dense warp: one sample per output pixel
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-2, w + 1, (b, n)), rng.uniform(-2, h + 1, (b, n))],
            axis=-1,
        ).astype(np.float32)
    )
    g = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def run(name, fn):
        f = jax.jit(fn)
        out = jax.device_get(f(img, coords, g))  # compile+warmup
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(img, coords, g)
        _ = float(np.asarray(o[0] if isinstance(o, tuple) else o).ravel()[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
        return out

    # (a) status quo: autodiff through sample_pixel
    def bwd_auto(img, coords, g):
        out, vjp = jax.vjp(lambda im: sample_pixel(im, coords), img)
        return vjp(g.reshape(out.shape))[0]

    want = run("a: autodiff (status quo)", bwd_auto)

    # weight matrices for the splat forms -----------------------------------
    def _weights(coords, size, axis):
        # (B, N) coords -> (B, N, size) one-hot-pair with bilinear weights,
        # zero rows for OOB taps (zero-padding semantics)
        cc = coords[..., axis]
        c0 = jnp.floor(cc)
        fr = cc - c0
        c0i = c0.astype(jnp.int32)
        ar = jnp.arange(size, dtype=jnp.int32)
        m0 = (c0i[..., None] == ar).astype(jnp.float32)
        m1 = (c0i[..., None] + 1 == ar).astype(jnp.float32)
        return m0 * (1.0 - fr[..., None]) + m1 * fr[..., None]

    # (c)/(d) dense einsum splat, chunked over N
    def bwd_einsum(img, coords, g, chunks):
        b_, h_, w_, c_ = img.shape
        wy = _weights(coords, h_, 1)  # (B, N, H)
        wx = _weights(coords, w_, 0)  # (B, N, W)
        n_ = coords.shape[1]
        cs = n_ // chunks
        out = jnp.zeros((b_, h_, w_, c_), jnp.float32)
        for k in range(chunks):
            sl = slice(k * cs, (k + 1) * cs)
            out = out + jnp.einsum(
                "bny,bnx,bnc->byxc", wy[:, sl], wx[:, sl], g[:, sl],
                preferred_element_type=jnp.float32,
            )
        return out

    for chunks in (1, 4, 16):
        try:
            got = run(
                f"einsum splat chunks={chunks}",
                functools.partial(bwd_einsum, chunks=chunks),
            )
            err = float(np.abs(np.asarray(got) - np.asarray(want)).max())
            print(f"   max_abs_err vs autodiff: {err:.2e}")
        except Exception as e:  # OOM etc.
            print(f"einsum splat chunks={chunks}: FAILED {type(e).__name__}: {e}")

    # (e) bf16 matmul splat (weights bf16, accumulate f32)
    def bwd_einsum_bf16(img, coords, g, chunks=4):
        b_, h_, w_, c_ = img.shape
        wy = _weights(coords, h_, 1).astype(jnp.bfloat16)
        wx = _weights(coords, w_, 0).astype(jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        n_ = coords.shape[1]
        cs = n_ // chunks
        out = jnp.zeros((b_, h_, w_, c_), jnp.float32)
        for k in range(chunks):
            sl = slice(k * cs, (k + 1) * cs)
            out = out + jnp.einsum(
                "bny,bnx,bnc->byxc", wy[:, sl], wx[:, sl], gb[:, sl],
                preferred_element_type=jnp.float32,
            )
        return out

    got = run("einsum splat bf16 chunks=4", bwd_einsum_bf16)
    err = float(np.abs(np.asarray(got) - np.asarray(want)).max())
    print(f"   max_abs_err vs autodiff: {err:.2e} (bf16 weights)")


if __name__ == "__main__":
    main()
