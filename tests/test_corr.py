"""Correlation lookup: patch-slice fast path == gather reference path."""
import numpy as np
import jax.numpy as jnp

from mrfa_tpu.models.raft import corr_block_lookup
from mrfa_tpu.ops.corr import corr_block_lookup_fast


def test_fast_lookup_matches_gather_path():
    rng = np.random.RandomState(0)
    bq, h, w = 37, 64, 64
    corr = rng.randn(bq, h, w, 1).astype(np.float32)
    # centers spanning in-bounds, near-edge, and far out-of-bounds
    coords = np.stack(
        [
            rng.uniform(-12, w + 12, size=bq),
            rng.uniform(-12, h + 12, size=bq),
        ],
        axis=-1,
    ).astype(np.float32)
    # exercise exactly-integer coords too (fx = fy = 0)
    coords[:5] = np.round(coords[:5])

    slow = np.asarray(corr_block_lookup(jnp.asarray(corr), jnp.asarray(coords)))
    fast = np.asarray(corr_block_lookup_fast(jnp.asarray(corr), jnp.asarray(coords)))
    assert slow.shape == fast.shape == (bq, 98)
    np.testing.assert_allclose(fast, slow, atol=2e-5)


def test_fast_lookup_all_oob_is_zero():
    corr = jnp.ones((3, 64, 64, 1))
    coords = jnp.asarray([[-50.0, 10.0], [10.0, 500.0], [-7.1, -7.1]])
    out = np.asarray(corr_block_lookup_fast(corr, coords))
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], 0.0)


def test_levels_lookup_matches_pooled_oracle():
    """The precomputed-levels lookup (fast + gather variants, plus vjp) must
    equal the single-map oracle when c1 is the exact 2x2 pool of c0."""
    import jax

    from mrfa_tpu.models.raft import corr_block_lookup as oracle
    from mrfa_tpu.ops.corr import (
        corr_block_lookup_levels,
        corr_block_lookup_levels_gather,
    )
    from mrfa_tpu.ops.resize import avg_pool

    rng = np.random.RandomState(5)
    bq, h, w = 37, 64, 64
    corr = jnp.asarray(rng.randn(bq, h, w, 1).astype(np.float32))
    coords = np.stack(
        [rng.uniform(-12, w + 12, size=bq), rng.uniform(-12, h + 12, size=bq)],
        axis=-1,
    ).astype(np.float32)
    coords[:5] = np.round(coords[:5])
    coords = jnp.asarray(coords)
    c0 = corr[..., 0]
    c1 = avg_pool(corr, 2)[..., 0]

    want = np.asarray(oracle(corr, coords))
    for fn in (corr_block_lookup_levels, corr_block_lookup_levels_gather):
        got = np.asarray(fn(c0, c1, coords))
        np.testing.assert_allclose(got, want, atol=2e-5)

    # vjp: fold the per-level cotangents through the pool to match the
    # single-map formulation's d_corr
    g = jnp.asarray(rng.randn(bq, 98).astype(np.float32))
    _, vjp_o = jax.vjp(oracle, corr, coords)
    want_dcorr, want_dcoords = vjp_o(g)
    _, vjp_l = jax.vjp(corr_block_lookup_levels, c0, c1, coords)
    d0, d1, got_dcoords = vjp_l(g)
    d1_up = jnp.repeat(jnp.repeat(d1, 2, axis=1), 2, axis=2) * 0.25
    np.testing.assert_allclose(
        np.asarray((d0 + d1_up)[..., None]), np.asarray(want_dcorr), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dcoords), np.asarray(want_dcoords), atol=3e-4
    )
