"""Model-block parity (vs torch oracles) and shape/structure tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stabstitch2_tpu.models import SpatialNet, TemporalNet, SmoothNet
from stabstitch2_tpu.models.backbone import ConvHead, MLPHead, ResNetStage1
from stabstitch2_tpu.models.smooth import smooth_outputs
from stabstitch2_tpu.utils import torch_import as ti
from stabstitch2_tpu.config import GRID_H, GRID_W


def unpack_sd(golden):
    return {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}


class TestStage1Parity:
    def test_converted_weights_match_torch(self, goldens):
        g = goldens("stage1_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti._stage1_entries(
            "feature_extractor_stage1", "stage1"))
        net = ResNetStage1()
        x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
        out = net.apply({"params": params["stage1"],
                         "batch_stats": stats["stage1"]}, x, False)
        ref = np.transpose(g["y"], (0, 2, 3, 1))
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


class TestHeadParity:
    def test_conv_fc_head(self, goldens):
        g = goldens("head_parity")
        sd = unpack_sd(g)
        mapping = (ti._conv_head_entries("regressNet2_part1", "conv", 4)
                   + ti._mlp_entries("regressNet2_part2", "fc"))
        params, _ = ti.convert_state_dict(sd, mapping)
        conv = ConvHead((64, 128, 128, 256))
        fc = MLPHead((1024, 512, 126))
        x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
        mid = conv.apply({"params": params["conv"]}, x)
        out = fc.apply({"params": params["fc"]}, mid)
        np.testing.assert_allclose(np.asarray(out), g["y"], rtol=2e-3, atol=2e-3)


class TestSmoothParity:
    def test_full_net_vs_torch(self, goldens):
        g = goldens("smooth_parity")
        sd = unpack_sd(g)
        params, _ = ti.convert_state_dict(sd, ti.smooth_mapping())
        net = SmoothNet()
        outs = net.apply({"params": params},
                         jnp.asarray(g["smesh1"]), jnp.asarray(g["smesh2"]),
                         jnp.asarray(g["tsmotion1"]), jnp.asarray(g["tsmotion2"]))
        d = smooth_outputs(outs)
        delta1 = np.asarray(d["smooth_path1"] - d["ori_path1"])
        delta2 = np.asarray(d["smooth_path2"] - d["ori_path2"])
        np.testing.assert_allclose(delta1, g["y"][..., 0:2], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(delta2, g["y"][..., 2:4], rtol=1e-3, atol=1e-4)
        # cumsum path assembly
        np.testing.assert_allclose(np.asarray(d["ori_path1"]),
                                   np.cumsum(g["tsmotion1"], axis=1), atol=1e-5)


class TestFullNetParity:
    """End-to-end composition parity vs the reference's COMPLETE network
    classes (Full_model_inference/Codes/spatial_network.py:139-333,
    temporal_network.py:60-175) run verbatim with a stubbed torchvision
    trunk — catches wrong warp directions / stage wiring that block-level
    goldens cannot see. Fixtures: tests/golden_gen/make_fullnet_goldens.py."""

    def test_spatialnet_forward(self, goldens):
        g = goldens("spatialnet_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti.spatial_mapping(),
                                              strict=True)
        net = SpatialNet()
        img1 = jnp.asarray(np.transpose(g["img1"], (0, 2, 3, 1)))
        img2 = jnp.asarray(np.transpose(g["img2"], (0, 2, 3, 1)))
        off1, mref, mtgt = net.apply({"params": params, "batch_stats": stats},
                                     img1, img2, False)
        np.testing.assert_allclose(np.asarray(off1), g["offset1"],
                                   rtol=1e-4, atol=1e-4)
        B = g["offset_ref"].shape[0]
        np.testing.assert_allclose(
            np.asarray(mref).reshape(B, -1), g["offset_ref"],
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mtgt).reshape(B, -1), g["offset_tgt"],
            rtol=1e-4, atol=1e-4)

    def test_spatialnet_build_motions(self, goldens):
        from stabstitch2_tpu.models.spatial import spatial_motions
        g = goldens("spatialnet_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti.spatial_mapping())
        net = SpatialNet()
        img1 = jnp.asarray(np.transpose(g["img1"], (0, 2, 3, 1)))
        img2 = jnp.asarray(np.transpose(g["img2"], (0, 2, 3, 1)))
        off1, mref, mtgt = net.apply({"params": params, "batch_stats": stats},
                                     img1, img2, False)
        out = spatial_motions(off1, mref, mtgt, 360, 480)
        np.testing.assert_allclose(np.asarray(out["motion1"]), g["motion1"],
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out["motion2"]), g["motion2"],
                                   rtol=1e-4, atol=2e-4)

    def test_temporalnet_clip(self, goldens):
        from stabstitch2_tpu.models.temporal import clip_motions
        g = goldens("temporalnet_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti.temporal_mapping())
        net = TemporalNet()
        frames = jnp.asarray(
            np.transpose(g["frames"][:, 0], (0, 2, 3, 1)))  # [T,H,W,3]
        motions = clip_motions(net, {"params": params, "batch_stats": stats},
                               frames)
        ref = g["motions"][:, 0]  # [T, GH+1, GW+1, 2]
        np.testing.assert_allclose(np.asarray(motions), ref,
                                   rtol=1e-4, atol=1e-4)


class TestBF16Backbone:
    """bf16 conv backbones (the inference default, init_stitcher) must stay
    within a small pixel budget of f32 under CONVERTED reference-layout
    weights — measured 0.0095/0.0024 px max on the parity fixtures."""

    def test_spatial_bf16_delta(self, goldens):
        from stabstitch2_tpu.models.spatial import spatial_motions
        g = goldens("spatialnet_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti.spatial_mapping())
        img1 = jnp.asarray(np.transpose(g["img1"], (0, 2, 3, 1)))
        img2 = jnp.asarray(np.transpose(g["img2"], (0, 2, 3, 1)))
        net = SpatialNet(dtype=jnp.bfloat16)
        off1, mref, mtgt = net.apply({"params": params, "batch_stats": stats},
                                     img1, img2, False)
        out = spatial_motions(off1, mref, mtgt, 360, 480)
        assert np.abs(np.asarray(out["motion1"]) - g["motion1"]).max() < 0.1
        assert np.abs(np.asarray(out["motion2"]) - g["motion2"]).max() < 0.1

    def test_temporal_bf16_delta(self, goldens):
        from stabstitch2_tpu.models.temporal import clip_motions
        g = goldens("temporalnet_parity")
        sd = unpack_sd(g)
        params, stats = ti.convert_state_dict(sd, ti.temporal_mapping())
        frames = jnp.asarray(np.transpose(g["frames"][:, 0], (0, 2, 3, 1)))
        net = TemporalNet(dtype=jnp.bfloat16)
        m = clip_motions(net, {"params": params, "batch_stats": stats},
                         frames)
        assert np.abs(np.asarray(m) - g["motions"][:, 0]).max() < 0.1


class TestVGGParity:
    def test_relu3_2_features(self, goldens):
        from stabstitch2_tpu.models.vgg import VGG19Features
        g = goldens("vgg_parity")
        sd = unpack_sd(g)
        params, _ = ti.convert_state_dict(sd, ti.vgg19_mapping())
        net = VGG19Features()
        x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
        out = net.apply({"params": params}, x)
        ref = np.transpose(g["y"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


class TestShapes:
    @pytest.fixture(scope="class")
    def spatial(self):
        net = SpatialNet()
        rng = jax.random.PRNGKey(0)
        img = jnp.zeros((1, 128, 160, 3))
        variables = net.init(rng, img, img, False)
        return net, variables

    def test_spatial_forward_shapes(self, spatial):
        net, variables = spatial
        img1 = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 160, 3))
        img2 = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 160, 3))
        off1, mref, mtgt = net.apply(variables, img1, img2, False)
        assert off1.shape == (2, 8)
        assert mref.shape == (2, GRID_H + 1, GRID_W + 1, 2)
        assert mtgt.shape == (2, GRID_H + 1, GRID_W + 1, 2)
        assert bool(jnp.all(jnp.isfinite(off1)))

    def test_spatial_full_res_shapes_via_eval_shape(self):
        # like the reference, FC widths are pinned by the init resolution;
        # at 360x480 the stage-1 head flattens 128*2*3=768 and stage-2 heads
        # 256*2*3=1536 (SpatialWarp/Codes/network.py:209,250)
        net = SpatialNet()
        img = jax.ShapeDtypeStruct((1, 360, 480, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda r, a, b: net.init(r, a, b, False), jax.random.PRNGKey(0),
            img, img)
        p = variables["params"]
        assert p["regress1_fc"]["fc0"]["kernel"].shape == (768, 512)
        assert p["regress2_fc_ref"]["fc0"]["kernel"].shape == (1536, 1024)
        out = jax.eval_shape(lambda v, a, b: net.apply(v, a, b, False),
                             variables, img, img)
        assert out[0].shape == (1, 8)

    def test_temporal_clip_motions(self):
        from stabstitch2_tpu.models.temporal import clip_motions
        net = TemporalNet()
        frames = jax.random.normal(jax.random.PRNGKey(0), (4, 128, 160, 3))
        variables = net.init(jax.random.PRNGKey(1), frames[:1], frames[:1], False)
        motions = clip_motions(net, variables, frames)
        assert motions.shape == (4, GRID_H + 1, GRID_W + 1, 2)
        np.testing.assert_allclose(np.asarray(motions[0]), 0.0)
        assert not np.allclose(np.asarray(motions[1]), 0.0)


class TestConverterStrict:
    def test_spatial_mapping_consumes_reference_layout(self, goldens):
        # the stage1 fixture uses exactly the reference's Sequential naming;
        # strict conversion must consume every key
        g = goldens("stage1_parity")
        sd = unpack_sd(g)
        ti.convert_state_dict(sd, ti._stage1_entries(
            "feature_extractor_stage1", "stage1"), strict=True)


class TestFullCheckpointSchemas:
    """Prove the converter maps the reference nets' full state_dicts onto
    our Flax trees (schemas captured by tests/golden_gen/make_ckpt_schema.py
    from structural torch mirrors of the reference module trees)."""

    # defined-but-unused parameters in the reference (dead code there):
    DEAD = {
        "spatial": (),
        # TemporalWarp defines feature_extractor_stage2 but never calls it
        "temporal": ("feature_extractor_stage2.",),
        # SmoothWarp defines embedding2 but never calls it
        "smooth": ("MotionPre.embedding2.",),
    }

    @pytest.fixture(scope="class")
    def schemas(self):
        import json
        import pathlib

        path = pathlib.Path(__file__).parent / "goldens" / "ckpt_schemas.json"
        if not path.exists():
            pytest.skip("schemas missing")
        with open(path) as f:
            return json.load(f)

    def _flax_tree(self, which):
        import jax

        key = jax.random.PRNGKey(0)
        if which == "spatial":
            net = SpatialNet()
            img = jax.ShapeDtypeStruct((1, 360, 480, 3), jnp.float32)
            return jax.eval_shape(lambda r, a, b: net.init(r, a, b, False),
                                  key, img, img)
        if which == "temporal":
            net = TemporalNet()
            img = jax.ShapeDtypeStruct((1, 360, 480, 3), jnp.float32)
            return jax.eval_shape(lambda r, a, b: net.init(r, a, b, False),
                                  key, img, img)
        net = SmoothNet()
        mesh = jax.ShapeDtypeStruct((1, 7, 7, 9, 2), jnp.float32)
        return jax.eval_shape(
            lambda r, m: net.init(r, m, m, m, m), key, mesh)

    @pytest.mark.parametrize("which", ["spatial", "temporal", "smooth"])
    def test_schema_converts_onto_flax_tree(self, schemas, which):
        rng = np.random.default_rng(0)
        sd = {k: rng.normal(0, 1, shape).astype(np.float32)
              for k, shape in schemas[which].items()}
        mapping = {"spatial": ti.spatial_mapping,
                   "temporal": ti.temporal_mapping,
                   "smooth": ti.smooth_mapping}[which]()
        params, stats = ti.convert_state_dict(sd, mapping)

        expected = self._flax_tree(which)
        import jax

        got = {"params": params}
        if stats:
            got["batch_stats"] = stats
        exp_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                     jax.tree_util.tree_flatten_with_path(expected)[0]}
        got_paths = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                     jax.tree_util.tree_flatten_with_path(got)[0]}
        assert exp_paths == got_paths, (
            set(exp_paths) ^ set(got_paths) or "shape mismatch")

        # every torch key consumed except the documented dead ones
        consumed = set()
        for tname, _, kind in mapping:
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                k = f"{tname}.{suffix}"
                if k in sd:
                    consumed.add(k)
        leftover = [k for k in sd if k not in consumed
                    and "num_batches_tracked" not in k]
        dead_prefixes = self.DEAD[which]
        unexpected = [k for k in leftover
                      if not any(k.startswith(p) for p in dead_prefixes)]
        assert not unexpected, unexpected
