"""Parity tests for the geometry core against reference goldens.

Fixtures in tests/goldens/ were produced by running the reference torch
kernels (see tests/golden_gen/make_goldens.py); these tests never touch
the reference itself.
"""

import numpy as np
import jax
import jax.numpy as jnp

from stabstitch2_tpu.ops import (
    solve_dlt,
    homo_warp,
    tps_warp,
    tps_transform_points,
    rigid_mesh,
    normalize_mesh,
    denormalize_mesh,
    h2mesh,
    cost_volume,
    ccl_flow,
)
from stabstitch2_tpu.ops.mesh import mesh_points
from stabstitch2_tpu.config import GRID_H, GRID_W


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TestDLT:
    def test_matches_reference(self, goldens):
        g = goldens("dlt")
        H = solve_dlt(jnp.asarray(g["src"]), jnp.asarray(g["dst"]))
        np.testing.assert_allclose(np.asarray(H), g["H"], rtol=2e-4, atol=2e-4)

    def test_maps_corners(self, goldens):
        g = goldens("dlt")
        H = solve_dlt(jnp.asarray(g["src"]), jnp.asarray(g["dst"]))
        src = jnp.asarray(g["src"])
        ones = jnp.ones((*src.shape[:-1], 1), src.dtype)
        homog = jnp.concatenate([src, ones], -1)
        mapped = jnp.einsum("bij,bpj->bpi", H, homog)
        mapped = mapped[..., :2] / mapped[..., 2:3]
        # the 8x8 DLT system at full-pixel scale has cond ~1e6, so an f32
        # solve (reference uses f32 torch.inverse too) carries ~1px noise;
        # exact parity with the reference H is asserted separately above.
        np.testing.assert_allclose(np.asarray(mapped), g["dst"], atol=2.5)


class TestHomoWarp:
    def test_same_size(self, goldens):
        g = goldens("homo")
        out = homo_warp(jnp.asarray(nchw_to_nhwc(g["img"])), jnp.asarray(g["theta"]),
                        g["img"].shape[2:])
        np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out"]),
                                   rtol=1e-4, atol=1e-4)

    def test_different_out_size(self, goldens):
        g = goldens("homo")
        h, w = g["img"].shape[2:]
        out = homo_warp(jnp.asarray(nchw_to_nhwc(g["img"])), jnp.asarray(g["theta"]),
                        (h + 9, w + 13))
        np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out_big"]),
                                   rtol=1e-4, atol=1e-4)

    def test_identity_is_near_identity(self):
        # identity homography resamples at x_px=(x+1)*W/2 on a grid of
        # linspace(-1,1,W): a slight stretch, NOT an exact copy — assert the
        # interior matches interpolation, borders finite.
        img = jnp.arange(2 * 8 * 10 * 3, dtype=jnp.float32).reshape(2, 8, 10, 3) / 100.0
        theta = jnp.stack([jnp.eye(3)] * 2)
        out = homo_warp(img, theta, (8, 10))
        assert out.shape == img.shape
        assert bool(jnp.all(jnp.isfinite(out)))


class TestTPSWarp:
    def test_normal_mode(self, goldens):
        g = goldens("tps")
        out = tps_warp(jnp.asarray(nchw_to_nhwc(g["img"])), jnp.asarray(g["source"]),
                       jnp.asarray(g["target"]), g["img"].shape[2:], mode="NORMAL")
        # golden was produced with the reference's f64 solve; our on-device
        # f32 solve shifts sampling coords by <=0.02px, which on a pure-noise
        # image (gradient O(1)/px) bounds the value delta at ~2e-2.
        np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out_normal"]),
                                   atol=2e-2)

    def test_fast_mode(self, goldens):
        g = goldens("tps")
        out = tps_warp(jnp.asarray(nchw_to_nhwc(g["img"])), jnp.asarray(g["source"]),
                       jnp.asarray(g["target"]), g["img"].shape[2:], mode="FAST")
        np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out_fast"]),
                                   atol=2e-2)

    def test_bigger_canvas(self, goldens):
        g = goldens("tps")
        h, w = g["img"].shape[2:]
        out = tps_warp(jnp.asarray(nchw_to_nhwc(g["img"])), jnp.asarray(g["source"]),
                       jnp.asarray(g["target"]), (h + 12, w + 8), mode="NORMAL")
        np.testing.assert_allclose(np.asarray(out), nchw_to_nhwc(g["out_big"]),
                                   atol=2e-2)


class TestTPSPoint:
    def test_matches_reference(self, goldens):
        g = goldens("tps_point")
        out = tps_transform_points(jnp.asarray(g["points"]), jnp.asarray(g["source"]),
                                   jnp.asarray(g["target"]))
        np.testing.assert_allclose(np.asarray(out), g["out"], rtol=1e-3, atol=1e-4)

    def test_control_points_map_to_targets(self, goldens):
        g = goldens("tps_point")
        out = tps_transform_points(jnp.asarray(g["source"]), jnp.asarray(g["source"]),
                                   jnp.asarray(g["target"]))
        # interpolating spline: control points map (near-)exactly
        np.testing.assert_allclose(np.asarray(out), g["target"], atol=5e-4)


class TestMesh:
    def test_rigid_mesh_layout(self):
        m = rigid_mesh(360, 480)
        assert m.shape == (GRID_H + 1, GRID_W + 1, 2)
        np.testing.assert_allclose(np.asarray(m[0, 0]), [0.0, 0.0])
        np.testing.assert_allclose(np.asarray(m[-1, -1]), [480.0, 360.0])
        np.testing.assert_allclose(np.asarray(m[0, 1]), [480.0 / GRID_W, 0.0])

    def test_normalize_roundtrip(self):
        m = rigid_mesh(360, 480)
        n = normalize_mesh(m, 360, 480)
        np.testing.assert_allclose(np.asarray(n[0, 0]), [-1.0, -1.0])
        np.testing.assert_allclose(np.asarray(n[-1, -1]), [1.0, 1.0])
        back = denormalize_mesh(n, 360, 480)
        np.testing.assert_allclose(np.asarray(back), np.asarray(m), atol=1e-4)

    def test_h2mesh_inverts_homography(self, goldens):
        g = goldens("dlt")
        H = solve_dlt(jnp.asarray(g["src"]), jnp.asarray(g["dst"]))
        m = rigid_mesh(360, 480)
        warped = h2mesh(H, m)
        # pushing the warped mesh forward through H recovers the rigid mesh
        from stabstitch2_tpu.ops import apply_homography_points
        fwd = apply_homography_points(H, mesh_points(warped))
        np.testing.assert_allclose(np.asarray(fwd),
                                   np.asarray(mesh_points(m))[None].repeat(H.shape[0], 0),
                                   rtol=1e-3, atol=2e-2)


class TestCostVolume:
    def test_search_range_3(self, goldens):
        g = goldens("cost_volume")
        vol = cost_volume(jnp.asarray(nchw_to_nhwc(g["x1"])),
                          jnp.asarray(nchw_to_nhwc(g["x2"])), 3, norm=False)
        ref = np.transpose(g["vol3"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(vol), ref, rtol=1e-4, atol=1e-5)

    def test_search_range_5(self, goldens):
        g = goldens("cost_volume")
        vol = cost_volume(jnp.asarray(nchw_to_nhwc(g["x1"])),
                          jnp.asarray(nchw_to_nhwc(g["x2"])), 5, norm=False)
        ref = np.transpose(g["vol5"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(vol), ref, rtol=1e-4, atol=1e-5)


class TestCCL:
    def test_matches_reference(self, goldens):
        g = goldens("ccl")
        flow = ccl_flow(jnp.asarray(nchw_to_nhwc(g["f1"])),
                        jnp.asarray(nchw_to_nhwc(g["f2"])))
        ref = np.transpose(g["flow"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(flow), ref, rtol=1e-3, atol=1e-4)


class TestMaskNoGather:
    """The compositor's arithmetic coverage mask must equal warping an
    all-ones channel (what the reference does) bit-for-bit in both modes."""

    def test_normal_mode(self):
        from stabstitch2_tpu.ops.interp import bilinear_mask, bilinear_sample

        rng = np.random.default_rng(0)
        ones = jnp.ones((3, 20, 30, 1), jnp.float32)
        x = jnp.asarray(rng.uniform(-1.4, 1.4, (3, 500)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1.4, 1.4, (3, 500)).astype(np.float32))
        gathered = np.asarray(bilinear_sample(ones, x, y))[..., 0]
        arith = np.asarray(bilinear_mask(20, 30, x, y))
        np.testing.assert_allclose(arith, gathered, atol=1e-6)

    def test_fast_mode(self):
        from stabstitch2_tpu.ops.interp import (
            grid_sample_align_corners,
            grid_sample_mask_align_corners,
        )

        rng = np.random.default_rng(1)
        ones = jnp.ones((3, 20, 30, 1), jnp.float32)
        x = jnp.asarray(rng.uniform(-1.4, 1.4, (3, 500)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-1.4, 1.4, (3, 500)).astype(np.float32))
        gathered = np.asarray(grid_sample_align_corners(ones, x, y))[..., 0]
        arith = np.asarray(grid_sample_mask_align_corners(20, 30, x, y))
        np.testing.assert_allclose(arith, gathered, atol=1e-6)


class TestCoordStride:
    """Coarse-grid TPS coordinate evaluation (the opt-in fast knob,
    StitchConfig.coord_stride=4; the default is the exact stride-1 path)
    must stay within a small pixel budget of the exact field on realistic
    smooth meshes."""

    def _coords(self, sigma, stride, seed=0):
        from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                              rigid_mesh)
        from stabstitch2_tpu.ops.tps import tps_params, tps_sample_coords

        rng = np.random.default_rng(seed)
        H, W, span, ih, iw = 416, 544, (383, 540), 360, 480
        rig = np.asarray(rigid_mesh(ih, iw))
        mesh = (rig[None] + rng.normal(0, sigma, (4, 7, 9, 2))
                + np.asarray([40.0, 10.0])).astype(np.float32)
        src = mesh_points(normalize_mesh(jnp.asarray(mesh), *span))
        tgt = jnp.broadcast_to(
            mesh_points(normalize_mesh(jnp.asarray(rig), ih, iw))[None],
            src.shape)
        T = tps_params(src, tgt)
        exact = tps_sample_coords(T, src, (H, W), grid_span=span)
        approx = tps_sample_coords(T, src, (H, W), grid_span=span,
                                   coord_stride=stride)
        dx = np.abs(np.asarray(approx[0] - exact[0])).max() * iw / 2
        dy = np.abs(np.asarray(approx[1] - exact[1])).max() * ih / 2
        return max(dx, dy)

    def test_stride4_under_quarter_pixel(self):
        # realistic camera-shake mesh noise (a few px at 60 px spacing)
        assert self._coords(sigma=3.0, stride=4) < 0.25

    def test_stride1_is_exact_path(self):
        assert self._coords(sigma=3.0, stride=1) == 0.0

    def test_composite_stride_vs_exact_frames(self):
        from stabstitch2_tpu.config import StitchConfig
        from stabstitch2_tpu.pipeline.compositor import composite_video

        rng = np.random.default_rng(2)
        T, H, W = 4, 120, 160
        i1 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        i2 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        xs, ys = np.linspace(0, W, 9), np.linspace(0, H, 7)
        base = np.stack(np.meshgrid(xs, ys), -1)[None]
        m1 = jnp.asarray((base + rng.normal(0, 1.0, (T, 7, 9, 2))
                          ).astype(np.float32))
        m2 = jnp.asarray((base + rng.normal(0, 1.0, (T, 7, 9, 2)) + 25
                          ).astype(np.float32))
        exact, _ = composite_video(i1, i2, m1, m2,
                                   StitchConfig(canvas_bucket=16,
                                                coord_stride=1),
                                   chunk=2, model_size=(H, W))
        approx, _ = composite_video(i1, i2, m1, m2,
                                    StitchConfig(canvas_bucket=16,
                                                 coord_stride=4),
                                    chunk=2, model_size=(H, W))
        d = np.abs(exact.astype(np.float32) - approx.astype(np.float32))
        # random-noise imagery = worst case for sub-pixel coordinate shifts
        assert d.mean() < 3.0


class TestPallasTPSKernel:
    def test_interpret_mode_matches_jnp(self):
        from stabstitch2_tpu.ops.tps import tps_params, tps_sample_coords
        from stabstitch2_tpu.ops.pallas_warp import tps_coords_fused

        rng = np.random.default_rng(0)
        xs = np.linspace(-1, 1, 9)
        ys = np.linspace(-1, 1, 7)
        mesh = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        src = jnp.asarray((mesh[None] + rng.normal(0, 0.06, (2, 63, 2))
                           ).astype(np.float32))
        tgt = jnp.asarray(np.tile(mesh[None], (2, 1, 1)).astype(np.float32))
        T = tps_params(src, tgt)
        for out_size in ((36, 48), (29, 48)):  # incl. non-multiple-of-8 rows
            x_ref, y_ref = tps_sample_coords(T, src, out_size,
                                             use_pallas=False)
            x_pal, y_pal = tps_coords_fused(T, src, out_size, interpret=True)
            np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                       atol=2e-4)


class TestPallasCostVolume:
    def test_interpret_mode_matches_jnp(self):
        from stabstitch2_tpu.ops.cost_volume import cost_volume
        from stabstitch2_tpu.ops.pallas_corr import cost_volume_fused

        rng = np.random.default_rng(7)
        for B, H, W, C, r in ((2, 12, 16, 128, 3), (1, 9, 10, 128, 5)):
            x1 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
            x2 = jnp.asarray(rng.normal(0, 1, (B, H, W, C)).astype(np.float32))
            ref = cost_volume(x1, x2, r, norm=False)
            pal = cost_volume_fused(x1, x2, r, True)
            np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5)

    def test_custom_vjp_matches_jnp_grad(self):
        from stabstitch2_tpu.ops.cost_volume import cost_volume
        from stabstitch2_tpu.ops.pallas_corr import cost_volume_fused

        rng = np.random.default_rng(3)
        x1 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 128)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 128)).astype(np.float32))

        def loss_ref(a, b):
            return jnp.sum(jnp.sin(cost_volume(a, b, 3, norm=False)))

        def loss_pal(a, b):
            return jnp.sum(jnp.sin(cost_volume_fused(a, b, 3, True)))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(x1, x2)
        g_pal = jax.grad(loss_pal, argnums=(0, 1))(x1, x2)
        for gr, gp in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                       atol=1e-5, rtol=1e-5)


class TestPatchGather:
    def test_patch_u8_matches_four_gather(self):
        """bilinear_sample_patch_u8 == bilinear_sample to FMA rounding
        (<= 2^-12 at 0..255 pixel scale — XLA contracts the two program
        shapes differently): in-range, low/high out-of-range, exact edge
        and corner-collapse cases."""
        from stabstitch2_tpu.ops.interp import (bilinear_sample,
                                                bilinear_sample_patch_u8)

        rng = np.random.default_rng(11)
        B, H, W = 3, 24, 31
        im = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
        imj = jnp.asarray(im)

        n = 4000
        # cover the full plane incl. far out-of-range on both sides
        x = rng.uniform(-1.8, 1.8, (B, n)).astype(np.float32)
        y = rng.uniform(-1.8, 1.8, (B, n)).astype(np.float32)
        # exact boundary values where clamping branches flip
        specials = np.array([-1.0, -1.0 + 2.0 / W, 1.0 - 2.0 / W, 1.0,
                             -1.0 - 2.0 / W, 1.0 + 2.0 / W, 0.0],
                            np.float32)
        x[:, :specials.size] = specials
        y[:, :specials.size] = specials[::-1]

        ref = bilinear_sample(imj.astype(jnp.float32), jnp.asarray(x),
                              jnp.asarray(y))
        got = bilinear_sample_patch_u8(imj, jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-2)

    def test_patch_u8_nan_coords_zero(self):
        """NaN coords: documented deviation — 0 instead of NaN."""
        from stabstitch2_tpu.ops.interp import bilinear_sample_patch_u8

        im = jnp.asarray(np.full((1, 8, 8, 3), 200, np.uint8))
        bad = jnp.full((1, 5), np.nan, jnp.float32)
        out = bilinear_sample_patch_u8(im, bad, bad)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


class TestPallasPatchGather:
    """Window-gather kernel (ops/pallas_gather.py, interpret mode on CPU)
    vs the XLA packed-patch formulation it replaces on TPU."""

    B, H, W = 2, 40, 48
    OH, OW = 48, 64

    def _coords(self, shift_x=0.0, shift_y=0.0, seed=0):
        """Smooth warp raster (the production invariant: canvas >= source,
        local slope ~<= 1) in normalized convention, [B, OH*OW]."""
        rng = np.random.default_rng(seed)
        yy = np.arange(self.OH, dtype=np.float32)[None, :, None]
        xx = np.arange(self.OW, dtype=np.float32)[None, None, :]
        ph = rng.uniform(0, 6.28, (self.B, 1, 1)).astype(np.float32)
        xs = (xx * (self.W / self.OW) * 0.93
              + 2.0 * np.cos(yy / self.OH * 5 + ph) + shift_x)
        ys = (yy * (self.H / self.OH) * 0.93
              + 3.0 * np.sin(xx / self.OW * 4 + ph) + shift_y)
        xn = np.broadcast_to(xs * 2.0 / self.W - 1.0,
                             (self.B, self.OH, self.OW))
        yn = np.broadcast_to(ys * 2.0 / self.H - 1.0,
                             (self.B, self.OH, self.OW))
        return (jnp.asarray(xn.reshape(self.B, -1)),
                jnp.asarray(yn.reshape(self.B, -1)))

    def _im(self, seed=3):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.integers(
            0, 256, (self.B, self.H, self.W, 3), dtype=np.uint8))

    def _run_both(self, x, y):
        from stabstitch2_tpu.ops.interp import bilinear_sample_patch_u8
        from stabstitch2_tpu.ops.pallas_gather import (
            bilinear_sample_patch_u8_pallas)

        im = self._im()
        ref = bilinear_sample_patch_u8(im, x, y)
        got, viol = bilinear_sample_patch_u8_pallas(im, x, y,
                                                    (self.OH, self.OW),
                                                    interpret=True)
        # the kernel returns the 2-D canvas layout; flatten to compare
        return (np.asarray(ref), np.asarray(got).reshape(self.B, -1, 3),
                bool(viol))

    def test_matches_xla_path_in_range(self):
        ref, got, viol = self._run_both(*self._coords())
        assert not viol
        np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_matches_xla_path_out_of_range(self):
        # shift parts of the raster off every image edge: zero-outside
        # (low side) and edge-collapse (high side) semantics must agree
        for sx, sy in ((-25.0, 0.0), (30.0, 0.0), (0.0, -22.0), (0.0, 28.0)):
            ref, got, viol = self._run_both(*self._coords(sx, sy))
            assert not viol
            np.testing.assert_allclose(got, ref, atol=1e-2)

    def test_violation_flag_and_exact_zero_overflow(self):
        # pathological warp on an image TALLER than the 128-row window:
        # alternate canvas rows sample the image top and bottom, so one
        # block's live span overflows the window. The kernel must FLAG it
        # and emit exact ZEROS for the overflowing pixels (never garbage),
        # while pixels whose corners fit stay exact.
        from stabstitch2_tpu.ops.interp import bilinear_sample_patch_u8
        from stabstitch2_tpu.ops.pallas_gather import (
            bilinear_sample_patch_u8_pallas)

        rng = np.random.default_rng(9)
        H, W = 220, 48
        im = jnp.asarray(rng.integers(0, 256, (self.B, H, W, 3),
                                      dtype=np.uint8))
        x, y = (np.asarray(v).reshape(self.B, self.OH, self.OW).copy()
                for v in self._coords())
        y[:, 1::2] = 0.9  # near image bottom on odd canvas rows
        x = jnp.asarray(x.reshape(self.B, -1))
        y = jnp.asarray(y.reshape(self.B, -1))
        got, viol = bilinear_sample_patch_u8_pallas(
            im, x, y, (self.OH, self.OW), interpret=True)
        assert bool(viol)
        got = np.asarray(got).reshape(self.B, -1, 3)
        ref = np.asarray(bilinear_sample_patch_u8(im, x, y))
        ok = np.isclose(got, ref, atol=1e-2).all(axis=-1)
        zeroed = (got == 0.0).all(axis=-1)
        # every pixel is either exact or exact-zero; both kinds occur
        assert (ok | zeroed).all()
        assert (~ok & zeroed).any()
        assert ok.any()

    def test_nan_coords_zero_and_flagged_ok(self):
        from stabstitch2_tpu.ops.pallas_gather import (
            bilinear_sample_patch_u8_pallas)

        x, y = self._coords()
        x = x.at[:, :7].set(jnp.nan)
        y = y.at[:, :7].set(jnp.nan)
        got, _ = bilinear_sample_patch_u8_pallas(
            self._im(), x, y, (self.OH, self.OW), interpret=True)
        got = np.asarray(got).reshape(self.B, -1, 3)
        np.testing.assert_array_equal(got[:, :7], 0.0)


class TestFusedWarp:
    """ONE-program composite warp (ops/pallas_fused.py, interpret mode on
    CPU): TPS eval + window gather + weighted combine vs the XLA
    formulation (tps_sample_coords + bilinear_sample_patch_u8 +
    bilinear_mask). Contract: <= 1 uint8 LSB from FMA contraction /
    per-tile association, exact zeros at dead pixels, exact-or-zero +
    flag on window overflow."""

    B, H, W = 3, 120, 160
    OH, OW = 144, 256
    SPAN = (140, 250)

    def _setup(self, seed=0, mesh_shift=10.0):
        from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                              rigid_mesh)
        from stabstitch2_tpu.ops.tps import tps_params

        rng = np.random.default_rng(seed)
        im = jnp.asarray(rng.integers(0, 255, (self.B, self.H, self.W, 3)),
                         jnp.uint8)
        xs = jnp.linspace(0.0, self.W, 9)
        ys = jnp.linspace(0.0, self.H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        mesh = base + jnp.asarray(rng.normal(0, 2.0, (self.B, 7, 9, 2)),
                                  jnp.float32) + mesh_shift
        norm = mesh_points(normalize_mesh(mesh, *self.SPAN))
        rigid = rigid_mesh(self.H, self.W, dtype=jnp.float32)
        nrig = jnp.broadcast_to(
            mesh_points(normalize_mesh(rigid, self.H, self.W))[None],
            norm.shape)
        return im, tps_params(norm, nrig), norm

    def _xla_ref(self, im, T, norm):
        from stabstitch2_tpu.ops.interp import (bilinear_mask,
                                                bilinear_sample_patch_u8)
        from stabstitch2_tpu.ops.tps import tps_sample_coords

        x_s, y_s = tps_sample_coords(T, norm, (self.OH, self.OW),
                                     grid_span=self.SPAN)
        ref = bilinear_sample_patch_u8(im, x_s, y_s).reshape(
            self.B, self.OH, self.OW, 3)
        mref = bilinear_mask(self.H, self.W, x_s, y_s).reshape(
            self.B, self.OH, self.OW)
        return np.asarray(ref), np.asarray(mref)

    def test_matches_xla_within_lsb(self):
        from stabstitch2_tpu.ops.pallas_fused import fused_warp_planes

        im, T, norm = self._setup()
        ref, mref = self._xla_ref(im, T, norm)
        pb, pg, pr, mask, viol = fused_warp_planes(
            im, T, norm, (self.OH, self.OW), grid_span=self.SPAN,
            interpret=True)
        assert not bool(viol)
        got = np.stack([np.asarray(pb), np.asarray(pg), np.asarray(pr)], -1)
        np.testing.assert_allclose(np.asarray(mask), mref, atol=1e-3)
        ru = np.clip(np.round(ref), 0, 255).astype(np.int16)
        gu = np.clip(np.round(got), 0, 255).astype(np.int16)
        d = np.abs(ru - gu)
        assert d.max() <= 1, d.max()
        assert (d > 0).mean() < 5e-3, (d > 0).mean()
        # dead pixels (zero coverage) are exact zeros
        dead = mref <= 0.0
        assert dead.any()
        np.testing.assert_array_equal(got[dead], 0.0)

    def test_mesh_far_outside_is_all_zero(self):
        from stabstitch2_tpu.ops.pallas_fused import fused_warp_planes

        im, T, norm = self._setup(mesh_shift=900.0)
        pb, pg, pr, mask, viol = fused_warp_planes(
            im, T, norm, (self.OH, self.OW), grid_span=self.SPAN,
            interpret=True)
        got = np.stack([np.asarray(pb), np.asarray(pg), np.asarray(pr)], -1)
        np.testing.assert_array_equal(got, 0.0)
        assert not bool(viol)

    def test_window_overflow_flags_and_zeros(self):
        """A window too small for the warp span must flag + zero, never
        emit garbage (same contract as the v2 gather)."""
        from stabstitch2_tpu.ops.pallas_fused import fused_warp_planes

        im, T, norm = self._setup()
        ref, mref = self._xla_ref(im, T, norm)
        pb, pg, pr, mask, viol = fused_warp_planes(
            im, T, norm, (self.OH, self.OW), grid_span=self.SPAN,
            nt=2, nct=1, interpret=True)
        assert bool(viol)
        got = np.stack([np.asarray(pb), np.asarray(pg), np.asarray(pr)], -1)
        ok = np.isclose(got, ref, atol=1.0).all(axis=-1)
        zeroed = (got == 0.0).all(axis=-1)
        assert (ok | zeroed).all()
        assert (~ok & zeroed).any()
        assert ok.any()

    def test_composite_chunk_fused_matches_xla(self):
        """End-to-end _composite_chunk parity: pallas_fused vs XLA, both
        output formats."""
        from stabstitch2_tpu.pipeline.compositor import _composite_chunk

        rng = np.random.default_rng(4)
        Bc, H, W = 2, 120, 160
        i1 = jnp.asarray(rng.integers(0, 255, (Bc, H, W, 3)), jnp.uint8)
        i2 = jnp.asarray(rng.integers(0, 255, (Bc, H, W, 3)), jnp.uint8)
        xs, ys = jnp.linspace(0.0, W, 9), jnp.linspace(0.0, H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        m1 = base + jnp.asarray(rng.normal(0, 2.0, (Bc, 7, 9, 2)),
                                jnp.float32)
        m2 = m1 + 12.0
        offset = jnp.asarray([-8.0, -8.0], jnp.float32)
        kw = dict(grid_span=(180, 200), coord_stride=1)
        # coverage: pixels outside BOTH views are exact zeros on the fused
        # path, while the XLA path's huge-weight cancellation there leaves
        # f32 residual speckle (reference-faithful; PARITY.md) — compare
        # covered pixels at <= 1 LSB and require clean zeros elsewhere
        from stabstitch2_tpu.ops.interp import bilinear_mask
        from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                              rigid_mesh)
        from stabstitch2_tpu.ops.tps import tps_params, tps_sample_coords

        n1 = mesh_points(normalize_mesh(m1 - offset, 180, 200))
        n2 = mesh_points(normalize_mesh(m2 - offset, 180, 200))
        rigid = rigid_mesh(H, W, dtype=jnp.float32)
        nr = jnp.broadcast_to(
            mesh_points(normalize_mesh(rigid, H, W))[None], n1.shape)
        src = jnp.concatenate([n1, n2], 0)
        tgt = jnp.concatenate([nr, nr], 0)
        x_s, y_s = tps_sample_coords(tps_params(src, tgt), src, (192, 256),
                                     grid_span=(180, 200))
        m = np.asarray(bilinear_mask(H, W, x_s, y_s)).reshape(
            2 * Bc, 192, 256)
        covered = (m[:Bc] > 1e-3) | (m[Bc:] > 1e-3)   # [Bc, 192, 256]

        for fmt in ("bgr", "yuv420"):
            ref, _ = _composite_chunk(i1, i2, m1, m2, offset, (192, 256),
                                      "NORMAL", "AVERAGE", out_format=fmt,
                                      **kw)
            got, viol = _composite_chunk(i1, i2, m1, m2, offset, (192, 256),
                                         "NORMAL", "AVERAGE",
                                         out_format=fmt, pallas_fused=True,
                                         **kw)
            assert not bool(viol)
            for pi, (r, g) in enumerate(zip(jax.tree_util.tree_leaves(ref),
                                            jax.tree_util.tree_leaves(got))):
                r = np.asarray(r).astype(np.int16)
                g = np.asarray(g).astype(np.int16)
                d = np.abs(r - g)
                if d.shape[1] == 192:       # full-res plane (bgr or Y)
                    cov = covered
                else:                       # 2x2-subsampled U/V plane
                    cov = covered.reshape(Bc, 96, 2, 128, 2).any((2, 4))
                cov = np.broadcast_to(cov.reshape(cov.shape + (1,) * (
                    d.ndim - 3)), d.shape)
                assert d[cov].max() <= 1, (fmt, pi, d[cov].max())

    def test_composite_chunk_fused_linear_fusion(self):
        from stabstitch2_tpu.pipeline.compositor import _composite_chunk

        rng = np.random.default_rng(5)
        Bc, H, W = 1, 120, 160
        i1 = jnp.asarray(rng.integers(0, 255, (Bc, H, W, 3)), jnp.uint8)
        i2 = jnp.asarray(rng.integers(0, 255, (Bc, H, W, 3)), jnp.uint8)
        xs, ys = jnp.linspace(0.0, W, 9), jnp.linspace(0.0, H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        m1 = base + jnp.asarray(rng.normal(0, 1.5, (Bc, 7, 9, 2)),
                                jnp.float32)
        m2 = m1 + 15.0
        offset = jnp.asarray([-8.0, -8.0], jnp.float32)
        kw = dict(grid_span=(180, 200), coord_stride=1)
        ref, _ = _composite_chunk(i1, i2, m1, m2, offset, (192, 256),
                                  "NORMAL", "LINEAR", **kw)
        got, viol = _composite_chunk(i1, i2, m1, m2, offset, (192, 256),
                                     "NORMAL", "LINEAR", pallas_fused=True,
                                     **kw)
        assert not bool(viol)
        d = np.abs(np.asarray(ref).astype(np.int16)
                   - np.asarray(got).astype(np.int16))
        # LINEAR's blend mask feeds a Gaussian blur; the <=1-LSB plane
        # deltas stay <=1 LSB through the convex blend
        assert d.max() <= 1, d.max()
