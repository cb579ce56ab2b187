"""Animation/serving surface tests (tiny fomm + prior_only model on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mrfa_tpu.animate import Animator, normalize_kp
from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.serving import AnimationServer

from tests.test_train import SIZE, small_cfg

# heavy (torch-reference goldens / e2e compiles): excluded from the fast
# lane `pytest -m 'not slow'` (see CLAUDE.md); full suite runs them all
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_model():
    cfg = small_cfg("fomm")
    cfg["raft_flow"]["prior_only"] = True  # cheap decode path
    model = MRFA(cfg)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = model.init(
        rngs, dummy, dummy, train=True, compute_loss=True, use_bg=True
    )
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    return model, variables


class TestNormalizeKp:
    def test_relative_math(self):
        rng = np.random.RandomState(0)
        mk = lambda s: {
            "kp": jnp.asarray(np.tanh(rng.randn(1, 10, 2)).astype(np.float32)),
            "jacobian": jnp.asarray(
                (np.eye(2) + 0.1 * rng.randn(1, 10, 2, 2)).astype(np.float32)
            ),
        }
        kp_s, kp_d, kp_d0 = mk(1), mk(2), mk(3)
        out = normalize_kp(
            kp_s, kp_d, kp_d0,
            use_relative_movement=True, use_relative_jacobian=True,
        )
        expect = np.asarray(kp_s["kp"]) + (
            np.asarray(kp_d["kp"]) - np.asarray(kp_d0["kp"])
        )
        np.testing.assert_allclose(np.asarray(out["kp"]), expect, atol=1e-6)
        jd = np.asarray(kp_d["jacobian"]) @ np.linalg.inv(np.asarray(kp_d0["jacobian"]))
        np.testing.assert_allclose(
            np.asarray(out["jacobian"]), jd @ np.asarray(kp_s["jacobian"]), atol=1e-5
        )

    def test_absolute_passthrough(self):
        kp = {"kp": jnp.zeros((1, 10, 2))}
        out = normalize_kp(kp, kp, kp, use_relative_movement=False)
        np.testing.assert_allclose(np.asarray(out["kp"]), 0.0)


class TestAnimator:
    def test_make_animation(self, tiny_model):
        model, variables = tiny_model
        animator = Animator(model, variables, relative=True)
        rng = np.random.RandomState(1)
        source = rng.rand(SIZE, SIZE, 3).astype(np.float32)
        driving = rng.rand(3, SIZE, SIZE, 3).astype(np.float32)
        preds = animator.make_animation(source, driving)
        assert len(preds) == 3
        assert preds[0].shape == (SIZE, SIZE, 3)
        assert np.isfinite(preds[0]).all()

    def test_chunked_matches_per_frame(self, tiny_model):
        """animate_chunk (scan-on-device, one dispatch per K frames) is a
        pure batching refactor: outputs must equal the per-frame path."""
        model, variables = tiny_model
        animator = Animator(model, variables, relative=True)
        rng = np.random.RandomState(4)
        source = rng.rand(SIZE, SIZE, 3).astype(np.float32)
        driving = rng.rand(4, SIZE, SIZE, 3).astype(np.float32)
        state = animator.begin(source, driving[0])
        want = [np.asarray(animator.animate_frame(state, f)[0][0]) for f in driving]
        got = np.asarray(animator.animate_chunk(state, driving)[:, 0])
        np.testing.assert_allclose(got, np.stack(want), atol=1e-5)
        # make_animation with chunk= covers the remainder path (4 = 3 + 1)
        preds = animator.make_animation(source, driving, chunk=3)
        np.testing.assert_allclose(np.stack(preds), np.stack(want), atol=1e-5)

    def test_find_best_frame(self, tiny_model):
        model, variables = tiny_model
        animator = Animator(model, variables)
        rng = np.random.RandomState(2)
        source = rng.rand(SIZE, SIZE, 3).astype(np.float32)
        driving = np.stack([source] + [rng.rand(SIZE, SIZE, 3).astype(np.float32)] * 2)
        # frame 0 IS the source -> best match must be 0
        assert animator.find_best_frame(source, driving) == 0


class TestSourceCache:
    def test_cached_decoder_matches_uncached(self):
        """The hoisted per-clip source cache (generator pyramid + f_s) must
        be a pure refactor: decoder output identical with and without it —
        on the FULL refinement path, not just prior_only."""
        cfg = small_cfg("fomm")
        model = MRFA(cfg)
        dummy = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "equivariance": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        }
        variables = model.init(
            rngs, dummy, dummy, train=True, compute_loss=True, use_bg=True
        )
        variables = {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }
        rng = np.random.RandomState(7)
        source = jnp.asarray(rng.rand(1, SIZE, SIZE, 3), jnp.float32)
        driving = jnp.asarray(rng.rand(1, SIZE, SIZE, 3), jnp.float32)

        from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

        img_down = antialias_downsample(source, AntiAliasParams.create(0.25))

        def run(m, src, dwn, drv, cache):
            kp_s = m.encode_kp(src)
            kp_d = m.encode_kp(drv)
            dm = m.run_dense_motion(src, kp_d, kp_s, None, False, 0.0, False)
            out, warp, occ = m.decoder(
                m.kp_for_decoder(kp_s), m.kp_for_decoder(kp_d), dm,
                img=dwn, img_full=src, train=False, source_cache=cache,
            )
            return out, warp, occ

        want = model.apply(
            variables, source, img_down, driving, None, method=run
        )
        cache = model.apply(
            variables, source,
            model.apply(
                variables, source,
                method=lambda m, s: m.encode_kp(s),
            ),
            img_down,
            method=lambda m, s, k, d: m.encode_source_cache(s, k, d),
        )
        got = model.apply(
            variables, source, img_down, driving, cache, method=run
        )
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-6
            )


class TestServing:
    def test_multi_stream(self, tiny_model):
        model, variables = tiny_model
        server = AnimationServer(model, variables)
        rng = np.random.RandomState(3)
        sources = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        first = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        state = server.open_streams(sources, first)
        out = server.serve(state, first)
        assert out.shape == (2, SIZE, SIZE, 3)
        assert bool(jnp.isfinite(out).all())

    def test_serve_chunk_matches_serve(self, tiny_model):
        model, variables = tiny_model
        server = AnimationServer(model, variables)
        rng = np.random.RandomState(5)
        sources = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        first = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        state = server.open_streams(sources, first)
        frames = rng.rand(3, 2, SIZE, SIZE, 3).astype(np.float32)
        want = np.stack([np.asarray(server.serve(state, f)) for f in frames])
        got = np.asarray(server.serve_chunk(state, frames))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_serve_formatted_matches_serve(self, tiny_model):
        model, variables = tiny_model
        server = AnimationServer(model, variables)
        rng = np.random.RandomState(7)
        sources = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        first = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        state = server.open_streams(sources, first)
        frame = rng.rand(2, SIZE, SIZE, 3).astype(np.float32)
        want = np.asarray(server.serve(state, frame))
        fs = server.compile_streams(state)
        got = np.asarray(server.serve_formatted(fs, frame))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mesh_serving_matches_single_device(self, tiny_model):
        """Multi-device serving (streams sharded over the 'data' mesh axis,
        SURVEY §2.5 / BASELINE serving config): S=8 streams over a 4-device
        mesh must produce the same frames as the single-device server."""
        from mrfa_tpu.parallel.mesh import make_mesh

        model, variables = tiny_model
        rng = np.random.RandomState(11)
        S = 8
        sources = rng.rand(S, SIZE, SIZE, 3).astype(np.float32)
        first = rng.rand(S, SIZE, SIZE, 3).astype(np.float32)
        frame = rng.rand(S, SIZE, SIZE, 3).astype(np.float32)
        frames2 = rng.rand(2, S, SIZE, SIZE, 3).astype(np.float32)

        single = AnimationServer(model, variables)
        st1 = single.open_streams(sources, first)
        want = np.asarray(single.serve(st1, frame))
        want_chunk = np.asarray(single.serve_chunk(st1, frames2))

        mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
        with mesh:
            server = AnimationServer(model, variables, mesh=mesh)
            st = server.open_streams(sources, first)
            got = server.serve(st, frame)
            # streams actually ride the data axis, not a replicated fallback
            assert len(got.sharding.device_set) == 4, got.sharding
            # atol 5e-5: GSPMD partitioning reassociates f32 reductions
            # (measured drift 1.4e-5 max over 393k elements)
            np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
            got_chunk = np.asarray(server.serve_chunk(st, frames2))
            np.testing.assert_allclose(got_chunk, want_chunk, atol=5e-5)
