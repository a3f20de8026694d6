"""Dataset sampler behavior + checkpoint round-trips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic import write_clip_dirs


def _make_dataset_tree(root, num_videos=2, frames=14, h=64, w=80):
    for v in range(num_videos):
        write_clip_dirs(str(root), num_frames=frames, height=h, width=w,
                        seed=v, video_name=f"vid{v}")
    return str(root)


def _add_motion_streams(root, frames):
    rng = np.random.default_rng(0)
    for vd in sorted(os.listdir(root)):
        for name in ("TemporalMotion1", "TemporalMotion2",
                     "SpatialMotion1", "SpatialMotion2"):
            d = os.path.join(root, vd, name)
            os.makedirs(d, exist_ok=True)
            for t in range(frames):
                np.save(os.path.join(d, f"{t:06d}.npy"),
                        rng.normal(0, 2, (7, 9, 2)).astype(np.float32))


class TestSamplers:
    def test_spatial_pairs_skip_and_swap(self, tmp_path):
        from stabstitch2_tpu.data.datasets import SpatialPairDataset

        root = _make_dataset_tree(tmp_path, num_videos=2, frames=10)
        train = SpatialPairDataset(root, training=True, seed=0)
        test = SpatialPairDataset(root, training=False)
        # training skips the first 2 frames of each video
        assert len(train) == 2 * (10 - 2)
        assert len(test) == 2 * 10
        a, b = train[0]
        assert a.shape == b.shape and a.dtype == np.uint8

    def test_temporal_windows(self, tmp_path):
        from stabstitch2_tpu.data.datasets import TemporalPairDataset

        root = _make_dataset_tree(tmp_path, num_videos=1, frames=10)
        ds = TemporalPairDataset(root, train_frame_num=4, seed=0)
        assert len(ds) == 10 - 4 + 1
        a, b = ds[0]
        assert a.shape == b.shape

    def test_smooth_windows_and_short_video_skip(self, tmp_path):
        from stabstitch2_tpu.data.datasets import SmoothWindowDataset

        root = _make_dataset_tree(tmp_path, num_videos=1, frames=14)
        _add_motion_streams(root, 14)
        # a second, too-short video must be skipped
        write_clip_dirs(str(tmp_path), num_frames=6, height=64, width=80,
                        seed=9, video_name="short")
        _add_motion_streams(root, 6) if False else None
        ds = SmoothWindowDataset(root, selected_frames=8, train_frame_num=12)
        assert len(ds) == 14 - 12 + 1
        tm1, tm2, sm1, sm2, im1, im2 = ds[0]
        assert tm1.shape == (8, 7, 9, 2)
        assert im1.shape[0] == 8 and im1.shape[-1] == 3

    def test_batch_iterator(self, tmp_path):
        from stabstitch2_tpu.data.datasets import (
            SpatialPairDataset,
            batch_iterator,
        )

        root = _make_dataset_tree(tmp_path, num_videos=1, frames=10)
        ds = SpatialPairDataset(root, training=False)
        batches = list(batch_iterator(ds, batch_size=4, seed=1))
        assert len(batches) == len(ds) // 4
        a, b = batches[0]
        assert a.shape[0] == 4 and a.shape == b.shape


class TestCheckpoints:
    def test_triad_roundtrip(self, tmp_path):
        from stabstitch2_tpu.models import SmoothNet
        from stabstitch2_tpu.utils.checkpoint import load_triad, save_triad

        net = SmoothNet()
        mesh = jnp.zeros((1, 7, 7, 9, 2))
        mv = net.init(jax.random.PRNGKey(3), mesh, mesh, mesh, mesh)
        sv = {"params": {"w": jnp.arange(4.0)}}
        tv = {"params": {"b": jnp.ones((2, 2))}}
        save_triad(str(tmp_path / "triad"), sv, tv, mv)
        s2, t2, m2 = load_triad(str(tmp_path / "triad"), sv, tv, mv)
        np.testing.assert_allclose(np.asarray(s2["params"]["w"]),
                                   np.arange(4.0))
        leaves1 = jax.tree_util.tree_leaves(mv)
        leaves2 = jax.tree_util.tree_leaves(m2)
        for l1, l2 in zip(leaves1, leaves2):
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))

    def test_train_checkpointer_resume(self, tmp_path):
        from stabstitch2_tpu.utils.checkpoint import TrainCheckpointer

        ckpt = TrainCheckpointer(str(tmp_path / "ck"))
        payload = {"params": {"k": np.ones((3,), np.float32) * 7},
                   "step": np.int32(42)}
        ckpt.save(42, payload)
        assert ckpt.latest_step() == 42
        restored = ckpt.restore({"params": {"k": np.zeros((3,), np.float32)},
                                 "step": np.int32(0)})
        np.testing.assert_allclose(restored["params"]["k"], 7.0)
        assert int(restored["step"]) == 42


class TestBatchFastPath:
    def test_get_batch_matches_items(self, tmp_path):
        from stabstitch2_tpu.data.datasets import SpatialPairDataset

        root = _make_dataset_tree(tmp_path, num_videos=1, frames=8)
        ds = SpatialPairDataset(root, training=False, model_size=(64, 80))
        idx = [0, 3, 5]
        a_b, b_b = ds.get_batch(idx)
        for row, i in enumerate(idx):
            a, b = ds[i]
            # native decoder may differ from cv2 by ~1 LSB
            assert np.mean(np.abs(a_b[row].astype(int) - a.astype(int))) < 2.0
            assert np.mean(np.abs(b_b[row].astype(int) - b.astype(int))) < 2.0
