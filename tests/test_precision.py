"""Selective mixed-precision policy: bf16 compute keeps geometry sane."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfa_tpu import precision
from mrfa_tpu.models.raft import RaftFlow

from tests.test_train import SIZE


@pytest.fixture(autouse=True)
def reset_policy():
    yield
    precision.set_compute_dtype(None)


def _raft(size):
    return RaftFlow(
        prior_only=False, num_kp=10, dim=256, size=size,
        generator={"num_channels": 3, "block_expansion": 64, "max_features": 512, "num_up_blocks": 5},
        driving_encoder={"in_features": 10, "block_expansion": 32, "max_features": 512, "num_blocks": 5},
        source_encoder={"in_features": 13, "block_expansion": 32, "max_features": 512, "num_blocks": 5},
    )


@pytest.mark.slow  # ~145 s: full tiny-model fwd in both policies
def test_bf16_policy_output_close_to_f32():
    rng = np.random.RandomState(0)
    kp_s = jnp.asarray(np.tanh(rng.randn(1, 10, 2)).astype(np.float32))
    kp_d = jnp.asarray(np.tanh(rng.randn(1, 10, 2)).astype(np.float32))
    h4 = SIZE // 4
    dm = {
        "deformation": jnp.asarray(np.tanh(rng.randn(1, h4, h4, 2) * 0.3).astype(np.float32)),
        "occlusion": jnp.asarray(rng.randn(1, h4, h4, 1).astype(np.float32)),
    }
    img = jnp.asarray(rng.rand(1, h4, h4, 3).astype(np.float32))
    img_full = jnp.asarray(rng.rand(1, SIZE, SIZE, 3).astype(np.float32))

    mod_f32 = _raft(SIZE)
    variables = mod_f32.init(jax.random.PRNGKey(0), kp_s, kp_d, dm, img, img_full)
    out_f32, _, _ = mod_f32.apply(variables, kp_s, kp_d, dm, img, img_full)

    precision.set_compute_dtype(jnp.bfloat16)
    mod_bf16 = _raft(SIZE)  # same param structure; policy affects compute dtype
    out_bf16, _, _ = mod_bf16.apply(variables, kp_s, kp_d, dm, img, img_full)
    precision.set_compute_dtype(None)

    diff = float(jnp.abs(out_f32 - out_bf16.astype(jnp.float32)).mean())
    # geometry (flows/coords) stays f32; only conv compute is bf16 — output
    # images in [0,1] should stay within ~1% mean abs of the f32 path
    assert diff < 0.02, f"bf16 policy diverged: mean |diff| = {diff}"
    assert bool(jnp.isfinite(out_bf16).all())
