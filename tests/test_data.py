"""Data pipeline tests: dataset layout, loaders, augmentation invariants."""
import os

import numpy as np
import pytest

from mrfa_tpu.data.augmentation import (
    AllAugmentationTransform,
    adjust_brightness,
    adjust_hue,
    adjust_saturation,
)
from mrfa_tpu.data.dataset import (
    BatchLoader,
    DatasetRepeater,
    FramesDataset,
    PairedDataset,
    img_as_float32,
    read_video,
)


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    """Synthetic dataset: train/test dirs of frame-directories."""
    try:
        import imageio.v2 as imageio
    except ImportError:
        import imageio
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.RandomState(0)
    for split, n_vids in [("train", 3), ("test", 2)]:
        for v in range(n_vids):
            vdir = root / split / f"id{v}#clip{v}"
            os.makedirs(vdir)
            for t in range(4):
                frame = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
                imageio.imsave(str(vdir / f"{t:07d}.png"), frame)
    return str(root)


class TestFramesDataset:
    def test_train_item(self, video_root):
        ds = FramesDataset(
            video_root, frame_shape=(16, 16, 3), is_train=True, seed=0,
            augmentation_params={"flip_param": {"horizontal_flip": True, "time_flip": True}},
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["source"].shape == (16, 16, 3)
        assert item["driving"].shape == (16, 16, 3)
        assert item["source"].dtype == np.float32
        assert 0.0 <= item["source"].min() and item["source"].max() <= 1.0

    def test_test_item(self, video_root):
        ds = FramesDataset(video_root, frame_shape=(16, 16, 3), is_train=False)
        item = ds[0]
        assert item["video"].shape == (4, 16, 16, 3)

    def test_id_sampling(self, video_root):
        ds = FramesDataset(
            video_root, frame_shape=(16, 16, 3), is_train=True,
            id_sampling=True, seed=0,
        )
        assert len(ds) == 3  # ids split on '#'
        item = ds[0]
        assert "source" in item

    def test_repeater(self, video_root):
        ds = FramesDataset(video_root, is_train=True, seed=0)
        rep = DatasetRepeater(ds, 5)
        assert len(rep) == 15
        assert rep[14]["source"].shape == rep[2]["source"].shape

    def test_paired(self, video_root):
        ds = FramesDataset(video_root, frame_shape=(16, 16, 3), is_train=False)
        paired = PairedDataset(ds, number_of_pairs=3)
        item = paired[0]
        assert item["driving_video"].shape[0] == 4
        assert item["source_video"].shape[0] == 1  # first frame only


class TestBatchLoader:
    def test_batches_and_sharding(self, video_root):
        ds = FramesDataset(video_root, is_train=True, seed=0)
        rep = DatasetRepeater(ds, 4)  # 12 items
        loader = BatchLoader(rep, batch_size=4, shuffle=True, seed=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 3
        assert batches[0]["source"].shape == (4, 16, 16, 3)
        # two-shard split covers disjoint indices
        l0 = BatchLoader(rep, batch_size=2, shard_index=0, num_shards=2, seed=1)
        l1 = BatchLoader(rep, batch_size=2, shard_index=1, num_shards=2, seed=1)
        assert len(l0) == 3 and len(l1) == 3

    def test_multi_worker_order_deterministic(self, video_root):
        """num_workers > 1 must yield the same batches in the same order as
        a single worker (round-robin per-worker queues; reference: torch
        DataLoader num_workers=8, train.py:40)."""
        ds = FramesDataset(video_root, is_train=True, seed=0)
        rep = DatasetRepeater(ds, 8)  # 24 items -> 6 batches of 4
        names1 = [
            b["name"]
            for b in BatchLoader(
                rep, batch_size=4, shuffle=True, seed=3, num_workers=1
            ).epoch(2)
        ]
        names3 = [
            b["name"]
            for b in BatchLoader(
                rep, batch_size=4, shuffle=True, seed=3, num_workers=3
            ).epoch(2)
        ]
        assert len(names1) == 6
        assert names1 == names3


class TestAugmentation:
    def test_brightness_saturation_ranges(self):
        img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
        out = adjust_brightness(img, 1.1)
        assert out.max() <= 1.0
        out = adjust_saturation(img, 0.0)  # fully desaturated -> gray
        assert np.allclose(out[..., 0], out[..., 1], atol=1e-6)

    def test_hue_roundtrip(self):
        img = np.random.RandomState(1).rand(8, 8, 3).astype(np.float32)
        out = adjust_hue(img, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-5)
        # full-turn shift is identity
        out = adjust_hue(adjust_hue(img, 0.25), -0.25)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_transform_applies(self):
        rng = np.random.RandomState(2)
        t = AllAugmentationTransform(
            rng=rng,
            flip_param={"horizontal_flip": True, "time_flip": True},
            jitter_param={"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1},
        )
        clip = [rng.rand(8, 8, 3).astype(np.float32) for _ in range(2)]
        out = t(clip)
        assert len(out) == 2
        assert out[0].shape == (8, 8, 3)
        assert out[0].dtype == np.float32
