"""Loss-function and metric parity tests vs torch/skimage-formula oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from stabstitch2_tpu.train import losses
from stabstitch2_tpu.ops.resize import resize_bicubic
from stabstitch2_tpu.metrics.psnr_ssim import psnr, ssim
from stabstitch2_tpu.metrics.scores import continue_paths, stability_score


class TestGridLosses:
    def test_inter_grid_4d(self, goldens):
        g = goldens("grid_losses")
        val = losses.inter_grid_loss(jnp.asarray(g["mesh4"]))
        np.testing.assert_allclose(float(val), float(g["inter4"]), rtol=1e-5)

    def test_inter_grid_5d_reference_quirk(self, goldens):
        g = goldens("grid_losses")
        val = losses.inter_grid_loss_5d_ref(jnp.asarray(g["mesh5"]))
        np.testing.assert_allclose(float(val), float(g["inter5"]), rtol=1e-5)

    def test_intra_grid_5d(self, goldens):
        g = goldens("grid_losses")
        val = losses.intra_grid_loss(jnp.asarray(g["mesh5"]))
        np.testing.assert_allclose(float(val), float(g["intra5"]), rtol=1e-5,
                                   atol=1e-7)


class TestBicubic:
    def test_align_corners_true(self, goldens):
        g = goldens("bicubic")
        x = np.transpose(g["x"], (0, 2, 3, 1))  # NHWC
        out = resize_bicubic(jnp.asarray(x), (28, 36), align_corners=True)
        ref = np.transpose(g["up_true"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_align_corners_false(self, goldens):
        g = goldens("bicubic")
        x = np.transpose(g["x"], (0, 2, 3, 1))
        out = resize_bicubic(jnp.asarray(x), (28, 36), align_corners=False)
        ref = np.transpose(g["up_false"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestPSNRSSIM:
    def test_psnr_formula(self):
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 255, (32, 40, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.float32)
        expected = 10 * np.log10(255.0 ** 2 / np.mean((a - b) ** 2))
        np.testing.assert_allclose(float(psnr(jnp.asarray(a), jnp.asarray(b))),
                                   expected, rtol=1e-5)

    def test_ssim_identity_is_one(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 255, (40, 50, 3)).astype(np.float32)
        assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5

    def test_ssim_against_direct_formula(self):
        # independent numpy implementation of skimage-0.15 SSIM (uniform 7x7)
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 255, (30, 34)).astype(np.float64)
        b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255)

        win, L = 7, 255.0
        C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        cov_norm = 49 / 48

        def ufilt(x):
            out = np.zeros((x.shape[0] - 6, x.shape[1] - 6))
            for i in range(7):
                for j in range(7):
                    out += x[i:i + out.shape[0], j:j + out.shape[1]]
            return out / 49.0

        ux, uy = ufilt(a), ufilt(b)
        vx = cov_norm * (ufilt(a * a) - ux * ux)
        vy = cov_norm * (ufilt(b * b) - uy * uy)
        vxy = cov_norm * (ufilt(a * b) - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)
             / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
        expected = S.mean()
        got = float(ssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_ssim_accurate_at_model_resolution(self):
        """Regression: the old float32 integral-image window sums cancel
        catastrophically at 360x480 (cumsum of x*x ~1e10, ulp ~1e3) —
        flat-region variances came out >50% wrong. Compare against an
        exact float64 sliding-window reference at full model size."""
        rng = np.random.default_rng(7)
        # flat-ish image (low variance) is the worst case for cancellation
        a = (128.0 + rng.normal(0, 2.0, (360, 480))).astype(np.float64)
        b = np.clip(a + rng.normal(0, 4.0, a.shape), 0, 255)

        win, L = 7, 255.0
        C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
        cov_norm = 49 / 48

        def ufilt(x):
            out = np.zeros((x.shape[0] - 6, x.shape[1] - 6))
            for i in range(7):
                for j in range(7):
                    out += x[i:i + out.shape[0], j:j + out.shape[1]]
            return out / 49.0

        ux, uy = ufilt(a), ufilt(b)
        vx = cov_norm * (ufilt(a * a) - ux * ux)
        vy = cov_norm * (ufilt(b * b) - uy * uy)
        vxy = cov_norm * (ufilt(a * b) - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)
             / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
        got = float(ssim(jnp.asarray(a, jnp.float32),
                         jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(got, S.mean(), rtol=1e-3)


class TestPathContinuation:
    def test_matches_sequential_recurrence(self):
        rng = np.random.default_rng(3)
        nw, W = 6, 7
        win_ori = rng.normal(0, 1, (nw, W, 7, 9, 2)).astype(np.float32)
        win_smooth = rng.normal(0, 1, (nw, W, 7, 9, 2)).astype(np.float32)
        ori, smooth = continue_paths(jnp.asarray(win_ori),
                                     jnp.asarray(win_smooth))
        # sequential re-implementation of the reference recurrence
        o = [win_ori[0][t] for t in range(W)]
        s = [win_smooth[0][t] for t in range(W)]
        for k in range(1, nw):
            o.append(o[-1] + (win_ori[k][-1] - win_ori[k][-2]))
            s.append(o[-1] + (win_smooth[k][-1] - win_ori[k][-1]))
        np.testing.assert_allclose(np.asarray(ori), np.stack(o), atol=1e-5)
        np.testing.assert_allclose(np.asarray(smooth), np.stack(s), atol=1e-5)

    def test_stability_zero_for_constant_path(self):
        path = jnp.ones((12, 7, 9, 2)) * 5.0
        assert float(stability_score(path)) < 1e-10


class TestStabilityOracle:
    def test_matches_explicit_formula(self):
        rng = np.random.default_rng(7)
        path = rng.normal(0, 1, (12, 7, 9, 2)).astype(np.float32)

        def l2(a, b):
            return np.mean(np.abs((a - b) ** 2))

        p = path
        mid = p[3:-3]
        expected = 0.0
        expected += (l2(p[:-6], mid) + l2(p[6:], mid)) * 0.1
        expected += (l2(p[1:-5], mid) + l2(p[5:-1], mid)) * 0.3
        expected += (l2(p[2:-4], mid) + l2(p[4:-2], mid)) * 0.9
        got = float(stability_score(jnp.asarray(path)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestMaskedScores:
    """Masked (padded-bucket) scores == eager scores on the true prefix."""

    def test_stability_masked_equals_sliced(self):
        from stabstitch2_tpu.metrics.scores import stability_score_masked

        rng = np.random.default_rng(11)
        full = rng.normal(0, 1, (16, 7, 9, 2)).astype(np.float32)
        for n in (9, 12, 16):
            path = np.concatenate(
                [full[:n], np.tile(full[n - 1:n], (16 - n, 1, 1, 1))], 0)
            got = float(stability_score_masked(jnp.asarray(path),
                                               jnp.int32(n)))
            want = float(stability_score(jnp.asarray(full[:n])))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_distortion_masked_equals_sliced(self):
        from stabstitch2_tpu.metrics.scores import (
            distortion_score,
            distortion_score_masked,
        )

        rng = np.random.default_rng(12)
        base = np.stack(np.meshgrid(np.linspace(0, 480, 9),
                                    np.linspace(0, 360, 7)), -1)
        mesh = (base[None] + rng.normal(0, 6, (16, 7, 9, 2))).astype(
            np.float32)
        for n in (7, 11, 16):
            got = float(distortion_score_masked(jnp.asarray(mesh),
                                                jnp.int32(n)))
            want = float(distortion_score(jnp.asarray(mesh[:n])))
            np.testing.assert_allclose(got, want, rtol=1e-5)


_HARNESS_STITCHER = []


@pytest.mark.slow  # compiles + executes the fused 360x480 metric programs
class TestMetricHarnessBucketed:
    """evaluate_video: parity with the eager path + one program per bucket."""

    def _stitcher(self):
        # one shared 360x480 stitcher across the class: building (and
        # compiling for) a second one doubles this module's wall time
        from stabstitch2_tpu.pipeline.stitcher import init_stitcher

        if not _HARNESS_STITCHER:
            _HARNESS_STITCHER.append(init_stitcher(rng_seed=0, chunk=8))
        return _HARNESS_STITCHER[0]

    def _clip(self, T, seed):
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_two_view_clip

        v1, v2 = make_two_view_clip(num_frames=T, height=360, width=480,
                                    seed=seed)
        return (v1.astype(np.float32) / 127.5 - 1.0,
                v2.astype(np.float32) / 127.5 - 1.0)

    def test_matches_eager_reference_path(self):
        from stabstitch2_tpu.metrics.harness import evaluate_video
        from stabstitch2_tpu.metrics.psnr_ssim import psnr as _psnr
        from stabstitch2_tpu.metrics.psnr_ssim import ssim as _ssim
        from stabstitch2_tpu.metrics.scores import distortion_score
        from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                              rigid_mesh)
        from stabstitch2_tpu.ops.tps import tps_warp_with_mask

        st = self._stitcher()
        lo1, lo2 = self._clip(10, seed=5)  # bucket pads 10 -> 16
        got = evaluate_video(st, lo1, lo2)

        # independent eager computation on the CROPPED smooth outputs
        smooth = st.motion_smooth(jnp.asarray(lo1), jnp.asarray(lo2))
        ori, sm = continue_paths(smooth["win_ori_path2"],
                                 smooth["win_smooth_path2"])
        want_stab = float(stability_score(sm))
        want_dist = float(distortion_score(smooth["smooth_mesh2"]))
        H, W = 360, 480
        rigid_pts = mesh_points(normalize_mesh(rigid_mesh(H, W), H, W))
        ps, ss = [], []
        for t in range(10):
            def warp(lo, mesh):
                src = mesh_points(normalize_mesh(mesh[t:t + 1], H, W))
                tgt = jnp.broadcast_to(rigid_pts[None], src.shape)
                return tps_warp_with_mask(
                    (jnp.asarray(lo[t:t + 1]) + 1) * 127.5, src, tgt, (H, W))
            w1, m1 = warp(lo1, smooth["smooth_mesh1"])
            w2, m2 = warp(lo2, smooth["smooth_mesh2"])
            ov = (m1 * m2)[..., None]
            ps.append(float(_psnr((w1 * ov)[0], (w2 * ov)[0])))
            ss.append(float(_ssim((w1 * ov)[0], (w2 * ov)[0])))
        np.testing.assert_allclose(got["stability"], want_stab, rtol=1e-4)
        np.testing.assert_allclose(got["distortion"], want_dist, rtol=1e-4)
        np.testing.assert_allclose(got["psnr"], np.mean(ps), rtol=1e-4)
        np.testing.assert_allclose(got["ssim"], np.mean(ss), rtol=1e-4)

    def test_no_recompile_across_lengths(self):
        from stabstitch2_tpu.metrics import harness

        st = self._stitcher()
        lo1, lo2 = self._clip(10, seed=6)
        harness.evaluate_video(st, lo1, lo2)  # warms the 16-bucket program
        sizes = st._metric_fused._cache_size()
        lo1b, lo2b = self._clip(13, seed=7)  # same bucket, new length
        harness.evaluate_video(st, lo1b, lo2b)
        after = st._metric_fused._cache_size()
        assert sizes == after, f"recompiled across lengths: {sizes} -> {after}"

    def test_uint8_input_matches_float(self):
        """uint8 frames (device-normalized) == float frames to fp noise."""
        from stabstitch2_tpu.metrics.harness import evaluate_video

        st = self._stitcher()
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_two_view_clip

        v1, v2 = make_two_view_clip(num_frames=9, height=360, width=480,
                                    seed=8)
        got_u8 = evaluate_video(st, v1, v2)
        got_f = evaluate_video(st, v1.astype(np.float32) / 127.5 - 1.0,
                               v2.astype(np.float32) / 127.5 - 1.0)
        for k in got_f:
            np.testing.assert_allclose(got_u8[k], got_f[k], rtol=2e-3,
                                       err_msg=k)

    def test_i420_upload_close_to_bgr(self):
        """upload='i420' (0.5 B/px, opt-in) shifts metrics only slightly.

        Chroma subsampling perturbs the frames the metrics read, so this
        is a closeness bound, not equality — the documented contract
        (metrics.harness.evaluate_video docstring)."""
        from stabstitch2_tpu.metrics.harness import evaluate_video

        st = self._stitcher()
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synthetic import make_two_view_clip

        v1, v2 = make_two_view_clip(num_frames=9, height=360, width=480,
                                    seed=9)
        got_bgr = evaluate_video(st, v1, v2)
        got_i420 = evaluate_video(st, v1, v2, upload="i420")
        assert abs(got_i420["psnr"] - got_bgr["psnr"]) < 0.7, \
            (got_i420["psnr"], got_bgr["psnr"])
        assert abs(got_i420["ssim"] - got_bgr["ssim"]) < 0.01, \
            (got_i420["ssim"], got_bgr["ssim"])
        # geometry metrics see only second-order motion changes
        np.testing.assert_allclose(got_i420["stability"],
                                   got_bgr["stability"], rtol=0.05)
        np.testing.assert_allclose(got_i420["distortion"],
                                   got_bgr["distortion"], rtol=0.05)
