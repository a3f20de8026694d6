"""The complete three-stage training recipe on synthetic data.

Exercises the inter-stage filesystem bus end to end (SURVEY §2 'filesystem
bus'): export Spatial/TemporalMotion npy streams with the alignment nets,
build the SmoothWindowDataset from them, and run smooth training steps.
"""

import glob
import os

import numpy as np
import pytest

from synthetic import write_clip_dirs

MH, MW = 128, 160


@pytest.mark.integration
@pytest.mark.slow  # full export -> smooth-training recipe end to end
class TestThreeStageRecipe:
    def test_export_then_smooth_training(self, tmp_path):
        import jax.numpy as jnp

        from stabstitch2_tpu.config import SmoothTrainConfig, StitchConfig
        from stabstitch2_tpu.data.datasets import (
            SmoothWindowDataset,
            batch_iterator,
        )
        from stabstitch2_tpu.models import SmoothNet
        from stabstitch2_tpu.pipeline.stitcher import init_stitcher
        from stabstitch2_tpu.train.common import create_train_state
        from stabstitch2_tpu.train.export import (
            export_spatial_motions,
            export_temporal_motions,
        )
        from stabstitch2_tpu.train.smooth import smooth_train_step

        train_dir = str(tmp_path / "training")
        write_clip_dirs(train_dir, num_frames=14, height=MH, width=MW, seed=3)

        stitcher = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                                 config=StitchConfig(canvas_bucket=32))
        n_s = export_spatial_motions(stitcher, train_dir)
        n_t = export_temporal_motions(stitcher, train_dir)
        assert n_s == 14 and n_t == 28  # both views for temporal

        vd = os.path.join(train_dir, "clip0")
        for stream in ("SpatialMotion1", "SpatialMotion2",
                       "TemporalMotion1", "TemporalMotion2"):
            files = glob.glob(os.path.join(vd, stream, "*.npy"))
            assert len(files) == 14, stream
            m = np.load(sorted(files)[0])
            assert m.shape == (7, 9, 2)
        # temporal frame 0 must be the zero motion
        np.testing.assert_allclose(
            np.load(os.path.join(vd, "TemporalMotion1", "000000.npy")), 0.0)

        cfg = SmoothTrainConfig(batch_size=2, frame_num=7, train_sqe=2)
        ds = SmoothWindowDataset(train_dir, selected_frames=8,
                                 train_frame_num=12, model_size=(MH, MW))
        assert len(ds) == 3  # 14 - 12 + 1
        net = SmoothNet()
        import jax

        mesh = jnp.zeros((1, 7, 7, 9, 2))
        variables = net.init(jax.random.PRNGKey(0), mesh, mesh, mesh, mesh)
        state = create_train_state(variables, cfg, steps_per_epoch=1)
        # note: images in this tree are MHxMW while the loss-prep warps use
        # the images' own resolution — consistent throughout
        it = batch_iterator(ds, 2, seed=0, drop_last=True)
        batch = next(it)
        state, metrics = smooth_train_step(
            state, tuple(jnp.asarray(b) for b in batch), net, cfg)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
