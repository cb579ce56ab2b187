"""Compare warp implementations on TPU: 4-tap take_along_axis (current) vs
one 2x2xC patch lax.gather."""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compilation_cache

    _enable_compilation_cache()
    from mrfa_tpu.ops.sampler import sample_pixel

    def patch_warp(img, coords):
        """Bilinear sample via a single (2,2,C) slice gather per pixel."""
        b, h, w, c = img.shape
        sdims = coords.shape[1:-1]
        cc = coords.reshape(b, -1, 2)
        ix, iy = cc[..., 0], cc[..., 1]
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        wx = (ix - x0f).astype(img.dtype)[..., None]
        wy = (iy - y0f).astype(img.dtype)[..., None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        # pad 1 left/top, 2 right/bottom; clamp starts into the padded range
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        x0p = jnp.clip(x0, -1, w) + 1
        y0p = jnp.clip(y0, -1, h) + 1
        starts = jnp.stack([y0p, x0p], axis=-1)  # (B, N, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )

        def g1(op, st):
            return jax.lax.gather(
                op, st, dnums, slice_sizes=(2, 2, c),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )

        patch = jax.vmap(g1)(imgp, starts)  # (B, N, 2, 2, C)
        # per-tap validity (zeros padding semantics); clamped coords read
        # pad zeros anyway, but the weights must also vanish for OOB taps
        vx0 = ((x0 >= 0) & (x0 < w)).astype(img.dtype)[..., None]
        vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(img.dtype)[..., None]
        vy0 = ((y0 >= 0) & (y0 < h)).astype(img.dtype)[..., None]
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(img.dtype)[..., None]
        out = (
            (1 - wx) * (1 - wy) * vx0 * vy0 * patch[:, :, 0, 0]
            + wx * (1 - wy) * vx1 * vy0 * patch[:, :, 0, 1]
            + (1 - wx) * wy * vx0 * vy1 * patch[:, :, 1, 0]
            + wx * wy * vx1 * vy1 * patch[:, :, 1, 1]
        )
        return out.reshape((b,) + sdims + (c,))

    def patch4_warp(img, coords):
        """Bilinear sample via ONE flat row gather per pixel from a
        pre-expanded (B, h+2, w+2, 4C) patch image (4 shifted copies
        concatenated channel-wise): half the gather descriptors of the
        (2,2,C) slice gather and a single linear start index per sample
        (no (B,N,2) start-tensor relayout)."""
        b, h, w, c = img.shape
        sdims = coords.shape[1:-1]
        cc = coords.reshape(b, -1, 2)
        ix, iy = cc[..., 0], cc[..., 1]
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        wx = (ix - x0f)[..., None]
        wy = (iy - y0f)[..., None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        imgp = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        img4 = jnp.concatenate(
            [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
             imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1,
        )  # (B, h+2, w+2, 4C): [y, x] = the 2x2xC patch at (y-1, x-1)
        flat = img4.reshape(b, (h + 2) * (w + 2), 4 * c)
        x0p = jnp.clip(x0, -1, w) + 1
        y0p = jnp.clip(y0, -1, h) + 1
        lin = y0p * (w + 2) + x0p
        v = jnp.take_along_axis(
            flat, lin[:, :, None], axis=1, mode="promise_in_bounds"
        )  # (B, N, 4C)
        p00, p10, p01, p11 = jnp.split(v, 4, axis=-1)
        vx0 = ((x0 >= 0) & (x0 < w)).astype(wx.dtype)[..., None]
        vx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(wx.dtype)[..., None]
        vy0 = ((y0 >= 0) & (y0 < h)).astype(wx.dtype)[..., None]
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(wx.dtype)[..., None]
        out = (
            (1 - wx) * (1 - wy) * vx0 * vy0 * p00
            + wx * (1 - wy) * vx1 * vy0 * p10
            + (1 - wx) * wy * vx0 * vy1 * p01
            + wx * wy * vx1 * vy1 * p11
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
        print(f"{name:34s}: {(tk - t1) / 20 * 1e3:8.3f} ms/op", flush=True)

    import os
    B = int(os.environ.get("MRFA_PROBE_B", "1"))
    for res, ch in ((256, 64), (128, 128), (256, 3)):
        feat = jnp.asarray(rng.randn(B, res, res, ch), jnp.bfloat16)
        coords = jnp.asarray(rng.rand(B, res, res, 2) * (res + 8) - 4, jnp.float32)
        # exactness vs current impl
        want = np.asarray(sample_pixel(feat, coords), np.float32)
        got = np.asarray(patch_warp(feat, coords), np.float32)
        got4 = np.asarray(patch4_warp(feat, coords), np.float32)
        err = np.abs(got - want).max()
        err4 = np.abs(got4 - want).max()
        print(f"B={B} res={res} ch={ch} patch-vs-cur={err:.3e} "
              f"patch4-vs-cur={err4:.3e}")
        report(f"sample_pixel cur {res}x{res}x{ch}",
               lambda c, a: sample_pixel(c, a), feat, coords)
        report(f"patch_warp      {res}x{res}x{ch}",
               lambda c, a: patch_warp(c, a), feat, coords)
        report(f"patch4_warp     {res}x{res}x{ch}",
               lambda c, a: patch4_warp(c, a), feat, coords)


if __name__ == "__main__":
    main()
