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
