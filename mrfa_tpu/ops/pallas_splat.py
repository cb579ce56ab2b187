"""Pallas TPU kernel for the dense-warp backward splat (d_image).

The warp backward d_img[b,y,x,c] = sum_n WY[b,n,y]*WX[b,n,x]*g[b,n,c]
(`ops/sampler.py::_splat`, the custom vjp of every bilinear warp — reference
semantics /root/reference/modules/util.py:26-38 via torch's grid_sample
autograd) is BANDWIDTH-bound in its XLA matmul form: the chunked
accumulation re-reads and re-writes the (B, H, W*C) f32 accumulator every
chunk and materializes the (B, chunk, W, C) outer product u in HBM. The
round-4 b=10 256px train profile measured ~470 MB of HBM traffic per chunk
over 161 chunks — ~160 ms for EACH of the two full-res (256^2, C=64) warp
backwards, ~480 ms/step for all warps together (35% of the 1372 ms step),
with the MXU at 17%.

This kernel restructures the same contraction so the traffic disappears:

  grid = (B, wc_tiles, query_chunks)   # chunks innermost
  - the (H, TWC) f32 output tile stays resident in VMEM across ALL query
    chunks (zeroed at chunk 0, written back to HBM once when the tile
    advances) — no accumulator round trips;
  - the one-hot pair matrices are built IN KERNEL from the raw
    (y0, x0, pair-weight) vectors (a few compares on the VPU), so the only
    HBM reads are the query vectors and the (chunk, C) gradient rows;
  - the u = WX (x) g outer product lives only in VMEM, expanded via an
    exact one-hot selection matmul (values are copied, never scaled) plus
    a lane-concat tile of g.

The MXU dot over the chunk axis (f32 accumulate) is identical work to the
XLA form — the kernel turns a bandwidth-bound op into a compute-bound one.

Semantics match `_splat` exactly: pair weights are cast to the gradient
dtype before the product (bf16 rounding identical to `_pair_mat`), u is
formed in that dtype, and accumulation is f32. Out-of-range taps carry
zero weights (or sentinel indices matching no column) and contribute
nothing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# queries per grid step (K dim of the accumulate matmul)
CHUNK = 1024
# target output-tile lane count (TW * C), clamped to [128, MAX_TWC]
TARGET_TWC = 2048
MAX_TWC = 4096


def pick_tile(w: int, c: int):
    """Largest power-of-two TW dividing w with TW*C <= MAX_TWC, lane-aligned.

    Returns None when no tile works (odd channel counts like C=3 whose
    row-tiles can't hit a 128-lane multiple) — callers fall back to the XLA
    splat there.
    """
    tw = w
    best = None
    while tw >= 1:
        twc = tw * c
        # tw must divide w: the grid writes n_wt = w // tw tiles and any
        # remainder columns would be silently left uninitialized
        if w % tw == 0 and twc <= MAX_TWC and twc % 128 == 0:
            best = tw
            if twc <= TARGET_TWC:
                break
        tw //= 2
    return best


def _splat_kernel(
    idx_ref, wts_ref, g_ref, e_ref, out_ref, *, h: int, tw: int, c: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    wi = pl.program_id(1)
    dt = g_ref.dtype
    cs = idx_ref.shape[2]
    # f32 inputs must NOT take the MXU's default single-pass bf16 rounding:
    # `_splat` computes f32 at Precision.HIGHEST, and the bench.py hardware
    # gate measured 4.5e-3 rel divergence at default precision. bf16 inputs
    # are exact under the native pass.
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    # one-hot pair rows, built in f32 (Mosaic only supports minor-dim
    # insertion on 32-bit types) and cast at the end — identical rounding
    # to casting the weights first, since each position holds one weight.
    # y: (cs, H): wy0 at row y0, wy1 at y0 + 1
    y0 = idx_ref[0, 0, :]
    wy0 = wts_ref[0, 0, :]
    wy1 = wts_ref[0, 1, :]
    hio = jax.lax.broadcasted_iota(jnp.int32, (cs, h), 1)
    zero = jnp.zeros((), jnp.float32)
    my = (
        jnp.where(y0[:, None] == hio, wy0[:, None], zero)
        + jnp.where((y0 + 1)[:, None] == hio, wy1[:, None], zero)
    ).astype(dt)

    # x over THIS tile's w range: (cs, TW)
    x0 = idx_ref[0, 1, :] - wi * tw  # tile-local column index
    wx0 = wts_ref[0, 2, :]
    wx1 = wts_ref[0, 3, :]
    wio = jax.lax.broadcasted_iota(jnp.int32, (cs, tw), 1)
    mx = (
        jnp.where(x0[:, None] == wio, wx0[:, None], zero)
        + jnp.where((x0 + 1)[:, None] == wio, wx1[:, None], zero)
    ).astype(dt)

    # expand to flat (cs, TW*C): mx element-repeated C times via the exact
    # one-hot selection matmul E (values copied, not scaled); g lane-tiled
    mxf = jax.lax.dot_general(
        mx, e_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic requires a 32-bit acc
        precision=prec,
    ).astype(dt)  # exact: E only copies values  # (cs, TWC)
    g2 = g_ref[0]  # (cs, C)
    gf = jnp.concatenate([g2] * tw, axis=1)  # (cs, TWC), col t*C+c = g[:, c]
    u = mxf * gf  # dt product, matching the XLA splat's u

    acc = jax.lax.dot_general(
        my, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (H, TWC) f32
    out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit, static_argnames=("h", "w", "interpret")
)
def splat_pallas(
    g, y0, wy0, wy1, x0, wx0, wx1, h: int, w: int, interpret: bool = False
):
    """d_img[b,y,x,c] = sum_n WY[b,n,y]*WX[b,n,x]*g[b,n,c] -> (B,h,w,C) f32.

    Drop-in for `ops/sampler.py::_splat` on shapes where `pick_tile` finds a
    lane-aligned tile (all the model's feature warps). Indices are the
    integer corner starts (clipped like `_pair_mat` to [-1, size]); weights
    are the validity-masked pair weights in f32.
    """
    b, n, c = g.shape
    dt = g.dtype
    tw = pick_tile(w, c)
    if tw is None:
        raise ValueError(f"no lane-aligned tile for w={w}, c={c}")
    twc = tw * c
    n_wt = w // tw
    assert tw * n_wt == w, f"tile {tw} does not divide w={w}"

    # f32 tiles are twice the bytes of bf16 in VMEM; at CHUNK=1024 and
    # TWC=2048 the (cs, TWC) intermediates (mxf/gf/u) overflow the 16 MB
    # scoped-VMEM stack (measured: 18.15M requested at (256,256,64) f32).
    # Halve the query chunk for 4-byte dtypes — grid doubles, tiles fit.
    chunk = CHUNK if jnp.dtype(dt).itemsize <= 2 else CHUNK // 2
    cs = min(chunk, max(128, n))
    steps = -(-n // cs)
    if steps * cs != n:
        pad = steps * cs - n
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        y0 = jnp.pad(y0, ((0, 0), (0, pad)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad)))
        # zero pair weights: padded rows contribute nothing
        wy0, wy1, wx0, wx1 = (
            jnp.pad(a, ((0, 0), (0, pad))) for a in (wy0, wy1, wx0, wx1)
        )

    # pack the query vectors so the blocked dims satisfy Mosaic's
    # (8, 128)-or-full tiling rule: (B, 2/4, Np) with the middle dim full
    idx = jnp.stack([y0, x0], axis=1)  # (B, 2, Np) s32
    wts = jnp.stack([wy0, wy1, wx0, wx1], axis=1).astype(jnp.float32)

    # exact element-repeat selection matrix: E[t, t*C + cc] = 1
    e = jnp.repeat(jnp.eye(tw, dtype=dt), c, axis=1)  # (TW, TWC)

    out = pl.pallas_call(
        functools.partial(_splat_kernel, h=h, tw=tw, c=c),
        grid=(b, n_wt, steps),
        in_specs=[
            pl.BlockSpec((1, 2, cs), lambda bi, wi, k: (bi, 0, k)),  # idx
            pl.BlockSpec((1, 4, cs), lambda bi, wi, k: (bi, 0, k)),  # wts
            pl.BlockSpec((1, cs, c), lambda bi, wi, k: (bi, k, 0)),  # g
            pl.BlockSpec((tw, twc), lambda bi, wi, k: (0, 0)),  # E
        ],
        out_specs=pl.BlockSpec((1, h, twc), lambda bi, wi, k: (bi, 0, wi)),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.float32),
        interpret=interpret,
    )(idx, wts, g, e)
    return out.reshape(b, h, w, c)
