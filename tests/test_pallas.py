"""Pallas corr-lookup kernel: interpret-mode exactness vs the gather oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from mrfa_tpu.ops.corr import corr_block_lookup
from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_impl


def test_pallas_lookup_matches_gather_interpret():
    rng = np.random.RandomState(0)
    bq = 24
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-12, 76, bq), rng.uniform(-12, 76, bq)], -1
    ).astype(np.float32)
    coords[:4] = np.round(coords[:4])  # integer coords: fx = fy = 0 edge case
    coords = jnp.asarray(coords)
    ref = corr_block_lookup(corr, coords)
    got = _corr_lookup_pallas_impl(corr, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_lookup_oob_zero_interpret():
    corr = jnp.ones((8, 64, 64, 1))
    coords = jnp.asarray([[-50.0, 5.0]] * 4 + [[5.0, 500.0]] * 4)
    out = np.asarray(_corr_lookup_pallas_impl(corr, coords, interpret=True))
    np.testing.assert_allclose(out, 0.0)


def test_pallas_lookup_bwd_matches_gather_vjp_interpret():
    """The fused backward kernel (per-query patch scatter + analytic coord
    grads) must match the gather formulation's autodiff vjp exactly."""
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_bwd_impl

    rng = np.random.RandomState(1)
    bq = 16
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
    ).astype(np.float32)
    coords = jnp.asarray(coords)
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))

    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    want_dcorr, want_dcoords = vjp(g)

    got_dcorr, got_dcoords = _corr_lookup_pallas_bwd_impl(
        corr, coords, g, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_dcorr), np.asarray(want_dcorr), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dcoords), np.asarray(want_dcoords), atol=3e-4
    )


def test_pallas_v2_matmul_form_fwd_bwd_interpret():
    """The block-vectorized matmul-form kernels (the production BACKWARD; the
    forward kept as an alternative) match the gather oracle and its vjp,
    including non-multiple-of-QB query counts and integer coords."""
    from mrfa_tpu.ops.pallas_kernels import (
        _corr_lookup_pallas_v2_bwd_impl,
        _corr_lookup_pallas_v2_impl,
    )

    rng = np.random.RandomState(2)
    bq = 24  # not a multiple of QB=16: exercises query padding
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-12, 76, bq), rng.uniform(-12, 76, bq)], -1
    ).astype(np.float32)
    coords[:4] = np.round(coords[:4])  # fx = fy = 0 edge case
    coords = jnp.asarray(coords)

    ref = corr_block_lookup(corr, coords)
    got = _corr_lookup_pallas_v2_impl(corr, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))
    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    want_dcorr, want_dcoords = vjp(g)
    got_dcorr, got_dcoords = _corr_lookup_pallas_v2_bwd_impl(
        corr, coords, g, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_dcorr), np.asarray(want_dcorr), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dcoords), np.asarray(want_dcoords), atol=3e-4
    )


def test_pallas_v2_oob_zero_interpret():
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_v2_impl

    corr = jnp.ones((8, 64, 64, 1))
    coords = jnp.asarray([[-50.0, 5.0]] * 4 + [[5.0, 500.0]] * 4)
    out = np.asarray(_corr_lookup_pallas_v2_impl(corr, coords, interpret=True))
    np.testing.assert_allclose(out, 0.0)


def _pret_levels(corr):
    """x-major pret inputs from y-major per-query maps (the oracle's input)."""
    from mrfa_tpu.ops.resize import avg_pool

    c0t = jnp.transpose(corr[..., 0], (0, 2, 1))
    c1t = jnp.transpose(avg_pool(corr, 2)[..., 0], (0, 2, 1))
    return c0t, c1t


def test_pallas_pret_fwd_matches_gather_interpret():
    """The pre-transposed-levels production path (zero XLA-side map prep)
    matches the gather oracle when fed exact transposes/pools, including
    query padding and integer coords."""
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_pret_impl

    rng = np.random.RandomState(3)
    bq = 24  # not a multiple of QB=16: exercises query padding
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-12, 76, bq), rng.uniform(-12, 76, bq)], -1
    ).astype(np.float32)
    coords[:4] = np.round(coords[:4])
    coords = jnp.asarray(coords)
    c0t, c1t = _pret_levels(corr)
    ref = corr_block_lookup(corr, coords)
    got = _corr_lookup_pallas_pret_impl(c0t, c1t, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_pret_fwd_bf16_maps_interpret():
    """bf16 maps stream into the pret kernel natively (the serving/train
    compute-dtype path): values pass through the f32 scratch exactly, so the
    result must match the gather oracle on the same bf16 maps to f32-blend
    precision."""
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_pret_impl

    rng = np.random.RandomState(9)
    bq = 32
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
                 ).astype(np.float32)
    )
    c0t, c1t = _pret_levels(corr)
    c0tb = c0t.astype(jnp.bfloat16)
    c1tb = c1t.astype(jnp.bfloat16)
    got = _corr_lookup_pallas_pret_impl(c0tb, c1tb, coords, interpret=True)
    assert got.dtype == jnp.bfloat16
    # oracle on the SAME bf16 values (cast back up: pass-through is exact)
    corr_b = jnp.transpose(c0tb.astype(jnp.float32), (0, 2, 1))[..., None]
    ref0 = corr_block_lookup(corr_b, coords)[:, : 49]
    # level 1 oracle: bf16-pooled maps, f32 blend
    from mrfa_tpu.ops.corr import corr_block_lookup_levels_gather

    ref = corr_block_lookup_levels_gather(
        jnp.transpose(c0tb.astype(jnp.float32), (0, 2, 1)),
        jnp.transpose(c1tb.astype(jnp.float32), (0, 2, 1)),
        coords,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :49], np.float32), np.asarray(ref0, np.float32),
        atol=2e-2, rtol=1e-2,
    )
    # backward on bf16 maps: the in-kernel-convert path (no f32 map
    # materialization) must match the f32 kernel's cotangents to bf16
    # quantization precision
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_pret_bwd_impl

    gg = jnp.asarray(rng.randn(bq, 98).astype(np.float32))
    d0b, d1b, dcb = _corr_lookup_pallas_pret_bwd_impl(
        c0tb, c1tb, coords, gg, interpret=True
    )
    assert d0b.dtype == jnp.bfloat16 and d1b.dtype == jnp.bfloat16
    d0f, d1f, dcf = _corr_lookup_pallas_pret_bwd_impl(
        c0tb.astype(jnp.float32), c1tb.astype(jnp.float32), coords, gg,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(d0b, np.float32), np.asarray(d0f), atol=5e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(d1b, np.float32), np.asarray(d1f), atol=5e-2, rtol=2e-2
    )
    np.testing.assert_allclose(np.asarray(dcb), np.asarray(dcf), atol=1e-5)


def test_pallas_pret_bwd_matches_gather_vjp_interpret():
    """The x-major mirror backward emits d_c0t / d_c1t directly in the maps'
    layout; folding them back through transpose/pool must reproduce the
    gather formulation's d_corr, and d_coords must match analytically."""
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_pret_bwd_impl

    rng = np.random.RandomState(4)
    bq = 24
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
    ).astype(np.float32)
    coords = jnp.asarray(coords)
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))

    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    want_dcorr, want_dcoords = vjp(g)

    d_c0t, d_c1t, got_dcoords = _corr_lookup_pallas_pret_bwd_impl(
        *_pret_levels(corr), coords, g, interpret=True
    )
    # fold level cotangents back into the y-major un-pooled map space
    d0 = jnp.transpose(d_c0t, (0, 2, 1))
    d1 = jnp.transpose(d_c1t, (0, 2, 1))
    d1_up = jnp.repeat(jnp.repeat(d1, 2, axis=1), 2, axis=2) * 0.25
    got_dcorr = (d0 + d1_up)[..., None]
    np.testing.assert_allclose(
        np.asarray(got_dcorr), np.asarray(want_dcorr), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dcoords), np.asarray(want_dcoords), atol=3e-4
    )


def _padded_levels(corr):
    """x-PADDED x-major pret inputs (the v3 serving path's map layout)."""
    from mrfa_tpu.ops.pallas_kernels import PAD

    c0t, c1t = _pret_levels(corr)
    zp = ((0, 0), (PAD, PAD), (0, 0))
    return jnp.pad(c0t, zp), jnp.pad(c1t, zp)


def test_pallas_padded_fwd_matches_gather_interpret():
    """The v3 pre-padded-levels kernel (zero per-query copies) matches the
    gather oracle, including query padding, integer coords and OOB."""
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_padded_impl

    rng = np.random.RandomState(5)
    bq = 24  # not a multiple of QB=16: exercises query padding
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-12, 76, bq), rng.uniform(-12, 76, bq)], -1
    ).astype(np.float32)
    coords[:4] = np.round(coords[:4])
    coords = jnp.asarray(coords)
    ref = corr_block_lookup(corr, coords)
    got = _corr_lookup_pallas_padded_impl(*_padded_levels(corr), coords,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_padded_bf16_maps_interpret():
    """bf16 padded maps stream natively; one whole-block convert feeds the
    f32 scratch — values must pass through exactly (vs the oracle on the
    same bf16 values)."""
    from mrfa_tpu.ops.corr import corr_block_lookup_levels_gather
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_padded_impl

    rng = np.random.RandomState(6)
    bq = 32
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
                 ).astype(np.float32)
    )
    c0p, c1p = _padded_levels(corr)
    got = _corr_lookup_pallas_padded_impl(
        c0p.astype(jnp.bfloat16), c1p.astype(jnp.bfloat16), coords,
        interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    c0t, c1t = _pret_levels(corr)
    ref = corr_block_lookup_levels_gather(
        jnp.transpose(c0t.astype(jnp.bfloat16).astype(jnp.float32), (0, 2, 1)),
        jnp.transpose(c1t.astype(jnp.bfloat16).astype(jnp.float32), (0, 2, 1)),
        coords,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=1e-2,
    )


def test_pallas_padded_vjp_matches_gather_vjp_interpret():
    """corr_block_lookup_pallas_padded's custom vjp (pret scatter + re-pad)
    must reproduce the gather formulation's cotangents on the pad interior
    and emit exact zeros in the pad rows."""
    from mrfa_tpu.ops.pallas_kernels import PAD, corr_block_lookup_pallas_padded

    rng = np.random.RandomState(7)
    bq = 16
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.uniform(-8, 72, bq), rng.uniform(-8, 72, bq)], -1
                 ).astype(np.float32)
    )
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))

    _, vjp = jax.vjp(corr_block_lookup, corr, coords)
    want_dcorr, want_dcoords = vjp(g)

    from mrfa_tpu.ops import pallas_kernels as pk

    c0p, c1p = _padded_levels(corr)
    # the public custom_vjp backward: slice pads, pret scatter, re-pad
    d_c0t, d_c1t, got_dcoords = pk._corr_lookup_pallas_pret_bwd_impl(
        c0p[:, PAD:-PAD, :], c1p[:, PAD:-PAD, :], coords, g, interpret=True
    )
    d0 = jnp.transpose(d_c0t, (0, 2, 1))
    d1 = jnp.transpose(d_c1t, (0, 2, 1))
    d1_up = jnp.repeat(jnp.repeat(d1, 2, axis=1), 2, axis=2) * 0.25
    got_dcorr = (d0 + d1_up)[..., None]
    np.testing.assert_allclose(
        np.asarray(got_dcorr), np.asarray(want_dcorr), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dcoords), np.asarray(want_dcoords), atol=3e-4
    )


def test_pallas_padded_oob_zero_interpret():
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_padded_impl

    corr = jnp.ones((8, 64, 64, 1))
    coords = jnp.asarray([[-50.0, 5.0]] * 4 + [[5.0, 500.0]] * 4)
    out = np.asarray(
        _corr_lookup_pallas_padded_impl(
            *_padded_levels(corr), coords, interpret=True
        )
    )
    np.testing.assert_allclose(out, 0.0)


def test_pallas_pret_oob_zero_interpret():
    from mrfa_tpu.ops.pallas_kernels import _corr_lookup_pallas_pret_impl

    corr = jnp.ones((8, 64, 64, 1))
    coords = jnp.asarray([[-50.0, 5.0]] * 4 + [[5.0, 500.0]] * 4)
    out = np.asarray(
        _corr_lookup_pallas_pret_impl(*_pret_levels(corr), coords, interpret=True)
    )
    np.testing.assert_allclose(out, 0.0)


# ---------------------------------------------------------------------------
# Warp-backward splat kernel (ops/pallas_splat.py)
# ---------------------------------------------------------------------------


def _splat_case(rng, b, h, w, c, n, dt):
    import jax.numpy as jnp2

    g = jnp2.asarray(rng.randn(b, n, c), dt)
    y0 = jnp2.asarray(rng.randint(-1, h + 1, (b, n)), jnp2.int32)
    x0 = jnp2.asarray(rng.randint(-1, w + 1, (b, n)), jnp2.int32)
    ws = [jnp2.asarray(rng.rand(b, n), jnp2.float32) for _ in range(4)]
    return g, y0, ws[0], ws[1], x0, ws[2], ws[3]


def test_splat_pallas_matches_xla_f32_interpret():
    from mrfa_tpu.ops.pallas_splat import splat_pallas
    from mrfa_tpu.ops.sampler import _splat

    rng = np.random.RandomState(0)
    for (b, h, w, c, n) in [(2, 32, 32, 64, 1024), (1, 16, 16, 128, 300),
                            (2, 64, 32, 256, 2048)]:
        args = _splat_case(rng, b, h, w, c, n, jnp.float32)
        want = np.asarray(_splat(*args, h, w))
        got = np.asarray(splat_pallas(*args, h, w, interpret=True))
        # f32: bit-identical contraction (f32 accumulate, exact products)
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_splat_pallas_matches_xla_bf16_interpret():
    from mrfa_tpu.ops.pallas_splat import splat_pallas
    from mrfa_tpu.ops.sampler import _splat

    rng = np.random.RandomState(1)
    args = _splat_case(rng, 2, 32, 32, 64, 1500, jnp.bfloat16)  # pad path
    want = np.asarray(_splat(*args, 32, 32), np.float32)
    got = np.asarray(splat_pallas(*args, 32, 32, interpret=True), np.float32)
    # interpret-mode dots round bf16 products (the MXU keeps them exact in
    # f32 — on-device error vs the XLA splat is ~5e-7, probe_splat_pallas);
    # tolerance here covers the interpret-only product rounding
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-2


def test_splat_pallas_oob_rows_drop_interpret():
    from mrfa_tpu.ops.pallas_splat import splat_pallas

    # every query OOB with zero weights -> zero image
    b, h, w, c, n = 1, 16, 16, 64, 256
    g = jnp.ones((b, n, c), jnp.float32)
    y0 = jnp.full((b, n), -1, jnp.int32)
    x0 = jnp.full((b, n), w, jnp.int32)
    zero = jnp.zeros((b, n), jnp.float32)
    one = jnp.ones((b, n), jnp.float32)
    # wy0 weights nonzero but their row (-1) matches no output row; wy1 hits
    # row 0 with zero weight; x0=w matches nothing, x0+1=w+1 matches nothing
    out = np.asarray(
        splat_pallas(g, y0, one, zero, x0, one, one, h, w, interpret=True)
    )
    np.testing.assert_allclose(out, 0.0)


def test_splat_dispatch_gates():
    from mrfa_tpu.ops.pallas_splat import pick_tile

    assert pick_tile(256, 64) == 32
    assert pick_tile(128, 128) == 16
    assert pick_tile(64, 256) == 8
    assert pick_tile(64, 3) is None  # RGB warps stay on the XLA splat


def test_pallas_padded_pads_are_load_bearing_interpret():
    """ADVICE r4: corr_block_lookup_pallas_padded's custom VJP emits exact
    zeros for the PAD-row cotangents, which is only correct when the pad
    rows are zero-CONSTANTS upstream (jnp.pad of zeros — true for the one
    in-repo caller, models/raft.py::_build_levels via x-padded source
    features). This test pins why: the FORWARD does read the pad rows
    (windows near the border land in them), so a future caller feeding
    real data there would get a forward that depends on values whose
    gradient the VJP silently drops."""
    from mrfa_tpu.ops.pallas_kernels import (
        PAD, _corr_lookup_pallas_padded_impl, corr_block_lookup_pallas_padded,
    )

    rng = np.random.RandomState(11)
    bq = 16
    corr = jnp.asarray(rng.randn(bq, 64, 64, 1).astype(np.float32))
    # border coords: their 7x7 windows extend into the pad rows
    coords = jnp.asarray(
        np.stack([rng.uniform(-2, 2, bq), rng.uniform(-2, 2, bq)], -1
                 ).astype(np.float32)
    )
    c0p, c1p = _padded_levels(corr)

    # 1) the VJP's pad-row cotangents are exact zeros (the contract) —
    # evaluate the public custom_vjp's backward rule directly
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))
    from mrfa_tpu.ops import pallas_kernels as pk

    d_c0t, d_c1t, _ = pk._corr_lookup_pallas_pret_bwd_impl(
        c0p[:, PAD:-PAD, :], c1p[:, PAD:-PAD, :], coords, g, interpret=True
    )
    d_c0p = jnp.pad(d_c0t, ((0, 0), (PAD, PAD), (0, 0)))
    assert float(jnp.abs(d_c0p[:, :PAD]).max()) == 0.0
    assert float(jnp.abs(d_c0p[:, -PAD:]).max()) == 0.0

    # 2) the forward READS the pad rows: poisoning them changes the output
    want = _corr_lookup_pallas_padded_impl(c0p, c1p, coords, interpret=True)
    poison = c0p.at[:, :PAD].set(7.0).at[:, -PAD:].set(7.0)
    got = _corr_lookup_pallas_padded_impl(poison, c1p, coords, interpret=True)
    assert float(jnp.abs(got - want).max()) > 1.0
