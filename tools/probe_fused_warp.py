"""Probe: fuse the final image warp into the iteration-5 context warp.

Both warps use the SAME coordinates (models/raft.py: `_warp_context(self, 5,
feature[5], flow + id_grid)` and the post-loop `warp_img = sample_pixel(
img_full, flow + id_grid)` — the last iteration leaves `flow` unchanged), so
channel-concatenating img_full onto feature[5] turns two 65 536-descriptor
gather streams into one. The open question is the descriptor rate for the
fused img4 row (4C = 268 elements > the current 256 threshold): this probe
times
  (a) two img4 warps (C=64 + C=3), shared coords — the current serving cost,
  (b) one fused img4 row gather, 4C=268 (and a 4C=288 lane-padded variant),
  (c) one fused (2,2,67) patch-slice gather,
all at B=1, N=65 536 (the serving full-res shape), bf16 rows / f32 coords.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops.sampler import _bilinear_core, _patch_gather, _tap_weights

    def img4_warp(img, coords, pad_to=None):
        """One flat row gather per sample from the pre-expanded 4C image,
        with NO 4C<=256 gate (the production impl's gate is what this probe
        is testing). Optionally zero-pad the 4C axis to `pad_to` lanes."""
        b, h, w, c = img.shape
        sdims = coords.shape[1:-1]
        cc = coords.reshape(b, -1, 2)
        ix, iy = cc[..., 0], cc[..., 1]
        x0, y0, wx, wy, vx0, vx1, vy0, vy1 = _tap_weights(ix, iy, h, w, True)
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        img4 = jnp.concatenate(
            [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
             imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1,
        )
        c4 = 4 * c
        if pad_to is not None and pad_to > c4:
            img4 = jnp.pad(img4, ((0, 0), (0, 0), (0, 0), (0, pad_to - c4)))
        flat = img4.reshape(b, (h + 2) * (w + 2), img4.shape[-1])
        lin = (jnp.clip(y0, -1, h) + 1) * (w + 2) + (jnp.clip(x0, -1, w) + 1)
        v = jnp.take_along_axis(
            flat, lin[:, :, None], axis=1, mode="promise_in_bounds"
        )
        p00, p10, p01, p11 = (
            v[..., :c], v[..., c:2 * c], v[..., 2 * c:3 * c], v[..., 3 * c:c4]
        )
        w00 = (((1.0 - wx) * (1.0 - wy)) * (vx0 * vy0))[..., None]
        w10 = ((wx * (1.0 - wy)) * (vx1 * vy0))[..., None]
        w01 = (((1.0 - wx) * wy) * (vx0 * vy1))[..., None]
        w11 = ((wx * wy) * (vx1 * vy1))[..., None]
        out = p00 * w00 + p10 * w10 + p01 * w01 + p11 * w11
        return out.astype(img.dtype).reshape((b,) + sdims + (c,))

    def patch_warp(img, coords):
        b, h, w, c = img.shape
        sdims = coords.shape[1:-1]
        cc = coords.reshape(b, -1, 2)
        ix, iy = cc[..., 0], cc[..., 1]
        x0, y0, wx, wy, vx0, vx1, vy0, vy1 = _tap_weights(ix, iy, h, w, True)
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        patch = _patch_gather(
            imgp, jnp.clip(y0, -1, h) + 1, jnp.clip(x0, -1, w) + 1, 2, 2
        )
        w00 = (((1.0 - wx) * (1.0 - wy)) * (vx0 * vy0))[..., None]
        w10 = ((wx * (1.0 - wy)) * (vx1 * vy0))[..., None]
        w01 = (((1.0 - wx) * wy) * (vx0 * vy1))[..., None]
        w11 = ((wx * wy) * (vx1 * vy1))[..., None]
        out = (
            patch[:, :, 0, 0] * w00 + patch[:, :, 0, 1] * w10
            + patch[:, :, 1, 0] * w01 + patch[:, :, 1, 1] * w11
        )
        return out.astype(img.dtype).reshape((b,) + sdims + (c,))

    rng = np.random.RandomState(0)

    def wall(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jnp.sum(out)))
        return (time.perf_counter() - t0) / reps

    def report(name, op, x, aux):
        def make(k):
            @jax.jit
            def run(x, aux):
                def body(c, _):
                    out = op(c, aux)
                    c = c + 1e-30 * jnp.mean(out).astype(c.dtype)
                    return c, ()
                c, _ = jax.lax.scan(body, x, None, length=k)
                return jnp.sum(c)
            return run
        t1 = wall(make(1), x, aux)
        tk = wall(make(21), x, aux)
        ms = (tk - t1) / 20 * 1e3
        print(f"{name:44s}: {ms:8.3f} ms/op", flush=True)
        return ms

    res = 256
    feat = jnp.asarray(rng.randn(1, res, res, 64), jnp.bfloat16)
    img = jnp.asarray(rng.randn(1, res, res, 3), jnp.bfloat16)
    fused = jnp.concatenate([feat, img], -1)  # (1, 256, 256, 67)
    coords = jnp.asarray(rng.rand(1, res, res, 2) * (res + 8) - 4, jnp.float32)

    # exactness: fused img4 / patch vs the production sampler, per slice
    cc = coords.reshape(1, -1, 2)
    want_f = np.asarray(
        _bilinear_core(feat, cc[..., 0], cc[..., 1], True), np.float32
    )
    want_i = np.asarray(
        _bilinear_core(img, cc[..., 0], cc[..., 1], True), np.float32
    )
    got = np.asarray(img4_warp(fused, coords), np.float32).reshape(1, -1, 67)
    gotp = np.asarray(patch_warp(fused, coords), np.float32).reshape(1, -1, 67)
    print(
        "exactness img4-268 feat/img:",
        np.abs(got[..., :64] - want_f).max(), np.abs(got[..., 64:] - want_i).max(),
        " patch-67:",
        np.abs(gotp[..., :64] - want_f).max(), np.abs(gotp[..., 64:] - want_i).max(),
    )

    def two_warps(fi, coords):
        f, i = fi[..., :64], fi[..., 64:]
        cc = coords.reshape(1, -1, 2)
        a = _bilinear_core(f, cc[..., 0], cc[..., 1], True)
        b = _bilinear_core(i, cc[..., 0], cc[..., 1], True)
        return jnp.concatenate([a, b], -1)

    t_two = report("(a) two img4 warps C=64 + C=3 (current)",
                   lambda o, a: two_warps(o, a), fused, coords)
    t_268 = report("(b) fused img4 row gather 4C=268",
                   lambda o, a: img4_warp(o, a), fused, coords)
    t_288 = report("(b') fused img4 row gather padded 4C->288",
                   lambda o, a: img4_warp(o, a, pad_to=288), fused, coords)
    t_384 = report("(b'') fused img4 row gather padded 4C->384",
                   lambda o, a: img4_warp(o, a, pad_to=384), fused, coords)
    t_pat = report("(c) fused (2,2,67) patch-slice gather",
                   lambda o, a: patch_warp(o, a), fused, coords)
    n = 256 * 256
    print(f"per-descriptor: two={t_two / 2 / n * 1e6:.1f} ns "
          f"fused268={t_268 / n * 1e6:.1f} fused288={t_288 / n * 1e6:.1f} "
          f"fused384={t_384 / n * 1e6:.1f} patch67={t_pat / n * 1e6:.1f}")


if __name__ == "__main__":
    main()
