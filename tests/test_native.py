"""Native C image codec: decode parity with imageio, size probe, batching."""
import numpy as np
import pytest

from mrfa_tpu import native


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    try:
        import imageio.v2 as imageio
    except ImportError:
        import imageio
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    path = str(tmp_path_factory.mktemp("imgs") / "t.png")
    imageio.imsave(path, img)
    return path, img


@pytest.mark.skipif(not native.available(), reason="native codec not built")
class TestNativeCodec:
    def test_size_probe(self, png):
        path, img = png
        assert native.image_size(path) == (48, 64)

    def test_decode_exact(self, png):
        path, img = png
        out = native.decode_resize(path, 48, 64)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)

    def test_batch_threads(self, png):
        path, img = png
        out = native.decode_batch([path] * 7, 48, 64, n_threads=3)
        assert out.shape == (7, 48, 64, 3)
        np.testing.assert_allclose(out[6], img.astype(np.float32) / 255.0, atol=1e-6)

    def test_downscale_range(self, png):
        path, _ = png
        out = native.decode_resize(path, 24, 32)
        assert out.shape == (24, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
