"""Trainer smoke tests: one jitted optimizer step per stage runs, produces
finite losses, and actually changes the parameters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stabstitch2_tpu.config import (
    SmoothTrainConfig,
    SpatialTrainConfig,
    TemporalTrainConfig,
)
from stabstitch2_tpu.models import SmoothNet, SpatialNet, TemporalNet
from stabstitch2_tpu.train.common import create_train_state, data_aug_pair
from stabstitch2_tpu.train.smooth import smooth_train_step
from stabstitch2_tpu.train.spatial import spatial_train_step
from stabstitch2_tpu.train.temporal import temporal_train_step

from synthetic import make_two_view_clip

MH, MW = 128, 160


def _clip_pair(n=2, seed=0):
    v1, v2 = make_two_view_clip(num_frames=n, height=MH, width=MW,
                                overlap=0.6, shake_px=2.0, seed=seed)
    to = lambda v: jnp.asarray(v.astype(np.float32) / 127.5 - 1.0)
    return to(v1), to(v2)


def _param_delta(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(leaves_a, leaves_b))


class TestSpatialStep:
    def test_one_step(self):
        cfg = SpatialTrainConfig(batch_size=2)
        net = SpatialNet()
        img1, img2 = _clip_pair()
        variables = net.init(jax.random.PRNGKey(0), img1[:1], img2[:1], False)
        state = create_train_state(variables, cfg, steps_per_epoch=5)
        new_state, metrics = spatial_train_step(
            state, img1, img2, jax.random.PRNGKey(1), net, cfg, None)
        assert np.isfinite(float(metrics["total"]))
        assert _param_delta(state.params, new_state.params) > 0
        # BN stats must move in train mode
        assert _param_delta(state.batch_stats, new_state.batch_stats) > 0


class TestTemporalStep:
    def test_one_step(self):
        cfg = TemporalTrainConfig(batch_size=2)
        net = TemporalNet()
        img1, img2 = _clip_pair(seed=4)
        variables = net.init(jax.random.PRNGKey(0), img1[:1], img2[:1], False)
        state = create_train_state(variables, cfg, steps_per_epoch=5)
        new_state, metrics = temporal_train_step(
            state, img1, img2, jax.random.PRNGKey(1), net, cfg)
        assert np.isfinite(float(metrics["total"]))
        assert _param_delta(state.params, new_state.params) > 0


class TestSmoothStep:
    def test_one_step(self):
        cfg = SmoothTrainConfig(batch_size=2, frame_num=7, train_sqe=2)
        net = SmoothNet()
        rng = np.random.default_rng(0)
        B, L = 2, 8
        mesh = jnp.zeros((1, 7, 7, 9, 2))
        variables = net.init(jax.random.PRNGKey(0), mesh, mesh, mesh, mesh)
        state = create_train_state(variables, cfg, steps_per_epoch=5)
        f32 = lambda shape, s: jnp.asarray(
            rng.normal(0, s, shape).astype(np.float32))
        v1, v2 = make_two_view_clip(num_frames=L, height=MH, width=MW, seed=2)
        to = lambda v: jnp.asarray(v.astype(np.float32) / 127.5 - 1.0)[None]
        batch = (f32((B // 2 * 2, L, 7, 9, 2), 2.0)[:B],
                 f32((B, L, 7, 9, 2), 2.0),
                 f32((B, L, 7, 9, 2), 8.0),
                 f32((B, L, 7, 9, 2), 8.0),
                 jnp.tile(to(v1), (B, 1, 1, 1, 1)),
                 jnp.tile(to(v2), (B, 1, 1, 1, 1)))
        new_state, metrics = smooth_train_step(state, batch, net, cfg)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert _param_delta(state.params, new_state.params) > 0


class TestSmoothLossParity:
    """Numeric oracle for the six-term recipe vs the reference's own loss
    block (SmoothWarp/Codes/train_ssd.py:144-203 run verbatim by
    tests/golden_gen/make_smoothloss_golden.py)."""

    def test_all_terms_match_reference(self, goldens):
        from stabstitch2_tpu.train.smooth import smooth_loss_fn
        from stabstitch2_tpu.utils import torch_import as ti

        g = goldens("smoothloss_parity")
        sd = {k[len("sd::"):]: g[k] for k in g.files if k.startswith("sd::")}
        params, _ = ti.convert_state_dict(sd, ti.smooth_mapping())
        cfg = SmoothTrainConfig(frame_num=7, train_sqe=2)
        net = SmoothNet()
        tb = lambda x: jnp.asarray(np.swapaxes(x, 0, 1))        # [B,T,...]
        ib = lambda x: jnp.asarray(np.transpose(x, (1, 0, 3, 4, 2)))  # NHWC
        batch = (tb(g["tmotion1"]), tb(g["tmotion2"]),
                 tb(g["smotion1"]), tb(g["smotion2"]),
                 ib(g["img1"]), ib(g["img2"]))
        total, metrics = smooth_loss_fn(params, net, batch, cfg)
        for name in ("data", "smoothness", "shape", "trajectory", "online",
                     "align"):
            np.testing.assert_allclose(
                float(metrics[name]), float(g[name]), rtol=2e-3,
                err_msg=name)
        np.testing.assert_allclose(float(total), float(g["total"]), rtol=2e-3)


class TestDataAug:
    def test_range_and_shape(self):
        img = jnp.ones((2, 8, 8, 3)) * 0.9
        a1, a2 = data_aug_pair(jax.random.PRNGKey(0), img, -img)
        assert a1.shape == img.shape
        assert float(jnp.max(a1)) <= 1.0 and float(jnp.min(a2)) >= -1.0
        # brightness/color jitter actually changes values
        assert not np.allclose(np.asarray(a1), np.asarray(img))


class TestEvalMode:
    def test_spatial_train_outputs_eval_path(self):
        # regression: train=False must not unpack a (out, vars) tuple
        from stabstitch2_tpu.train.spatial import spatial_train_outputs
        net = SpatialNet()
        img1, img2 = _clip_pair()
        variables = net.init(jax.random.PRNGKey(0), img1[:1], img2[:1], False)
        out, new_vars = spatial_train_outputs(net, variables, img1[:1],
                                              img2[:1], train=False)
        assert new_vars == {}
        assert out["output_tps_ref"].shape[-1] == 4

    def test_temporal_train_outputs_eval_path(self):
        from stabstitch2_tpu.train.temporal import temporal_train_outputs
        net = TemporalNet()
        img1, img2 = _clip_pair(seed=5)
        variables = net.init(jax.random.PRNGKey(0), img1[:1], img2[:1], False)
        out, new_vars = temporal_train_outputs(net, variables, img1[:1],
                                               img2[:1], train=False)
        assert new_vars == {}
        assert out["output_mesh"].shape[-1] == 6


class TestPerceptualPath:
    def test_spatial_step_with_vgg(self):
        from stabstitch2_tpu.models import VGG19Features
        from stabstitch2_tpu.train.spatial import make_vgg_apply

        cfg = SpatialTrainConfig(batch_size=2, perception_weight=1e-3)
        net = SpatialNet()
        img1, img2 = _clip_pair(seed=9)
        variables = net.init(jax.random.PRNGKey(0), img1[:1], img2[:1], False)
        state = create_train_state(variables, cfg, steps_per_epoch=5)
        vgg = VGG19Features()
        vgg_vars = vgg.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, MH, MW, 3)))
        vgg_apply = make_vgg_apply(vgg_vars)
        new_state, metrics = spatial_train_step(
            state, img1, img2, jax.random.PRNGKey(2), net, cfg, vgg_apply)
        assert "perception" in metrics
        assert np.isfinite(float(metrics["perception"]))
        assert np.isfinite(float(metrics["total"]))
