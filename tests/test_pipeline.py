"""Pipeline stage tests + a small end-to-end integration test.

The integration test runs at reduced model resolution (128x160) so the CPU
suite stays fast; full-resolution behavior is covered by the bench and the
TPU driver.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.pipeline.smoothing import smooth_all_windows, window_indices
from stabstitch2_tpu.pipeline.transport import transport_temporal_motion
from stabstitch2_tpu.pipeline.compositor import compute_canvas, composite_video
from stabstitch2_tpu.pipeline.stitcher import init_stitcher
from stabstitch2_tpu.ops.blend import average_fusion, gaussian_blur, linear_fusion

from synthetic import make_two_view_clip


class TestTransport:
    def test_zero_motion_stays_zero(self):
        # if spatial motion is zero and temporal motion is zero, the
        # transported motion is zero (spline is identity)
        T = 5
        tmotion = jnp.zeros((T, 7, 9, 2))
        smotion = jnp.zeros((T, 7, 9, 2))
        ts = transport_temporal_motion(tmotion, smotion, 360, 480)
        np.testing.assert_allclose(np.asarray(ts), 0.0, atol=1e-3)

    def test_identity_spatial_passes_temporal_through(self):
        # with zero spatial motion, the stitched frame IS the original frame:
        # tsmotion_t = (rigid + tmotion_t) - (rigid) - 0 = tmotion_t
        T = 4
        rng = np.random.default_rng(0)
        tmotion = jnp.asarray(rng.normal(0, 3, (T, 7, 9, 2)).astype(np.float32))
        smotion = jnp.zeros((T, 7, 9, 2))
        ts = transport_temporal_motion(tmotion, smotion, 360, 480)
        np.testing.assert_allclose(np.asarray(ts[1:]), np.asarray(tmotion[1:]),
                                   atol=5e-2)
        np.testing.assert_allclose(np.asarray(ts[0]), 0.0)


class TestSmoothingWindows:
    def test_window_indices(self):
        idx = np.asarray(window_indices(10, 7))
        assert idx.shape == (4, 7)
        assert idx[0].tolist() == list(range(7))
        assert idx[-1].tolist() == list(range(3, 10))

    def test_assembly_matches_sequential(self):
        # batched windows must equal running windows one by one
        import jax
        from stabstitch2_tpu.models import SmoothNet
        from stabstitch2_tpu.models.smooth import smooth_outputs

        net = SmoothNet()
        T, W = 10, 7
        rng = np.random.default_rng(3)
        smesh1 = jnp.asarray(rng.normal(0, 1, (T, 7, 9, 2)).astype(np.float32))
        smesh2 = jnp.asarray(rng.normal(0, 1, (T, 7, 9, 2)).astype(np.float32))
        ts1 = jnp.asarray(rng.normal(0, 0.2, (T, 7, 9, 2)).astype(np.float32))
        ts2 = jnp.asarray(rng.normal(0, 0.2, (T, 7, 9, 2)).astype(np.float32))
        variables = net.init(jax.random.PRNGKey(0), smesh1[None, :W],
                             smesh2[None, :W], ts1[None, :W], ts2[None, :W])

        out = smooth_all_windows(net, variables, smesh1, smesh2, ts1, ts2,
                                 window=W, chunk=3)

        # sequential reference loop (mirrors the driver)
        seq = []
        for k in range(T - W + 1):
            w_ts1 = ts1[k:k + W].at[0].set(0.0)
            w_ts2 = ts2[k:k + W].at[0].set(0.0)
            raw = net.apply(variables, smesh1[None, k:k + W],
                            smesh2[None, k:k + W], w_ts1[None], w_ts2[None])
            seq.append(smooth_outputs(raw)["smooth_mesh1"][0])
        expected = jnp.concatenate(
            [seq[0]] + [s[-1:] for s in seq[1:]], axis=0)
        np.testing.assert_allclose(np.asarray(out["smooth_mesh1"]),
                                   np.asarray(expected), rtol=1e-4, atol=1e-5)


class TestBlend:
    def test_average_fusion_is_identity_on_disjoint(self):
        a = jnp.zeros((4, 6, 3)).at[:, :3].set(100.0)
        b = jnp.zeros((4, 6, 3)).at[:, 3:].set(50.0)
        fused = np.asarray(average_fusion(a, b))
        np.testing.assert_allclose(fused[:, :3], 100.0, atol=1e-3)
        np.testing.assert_allclose(fused[:, 3:], 50.0, atol=1e-3)

    def test_gaussian_blur_matches_direct_conv(self):
        # independent oracle: explicit numpy convolution with reflect padding
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (1, 30, 34, 2)).astype(np.float32)
        k = 21
        g = np.exp(-((np.arange(k) - k // 2) ** 2) / (2 * 20.0 ** 2))
        g = (g / g.sum()).astype(np.float32)
        pad = k // 2
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
        ref = np.zeros_like(x)
        for i in range(k):
            for j in range(k):
                ref += g[i] * g[j] * xp[:, i:i + 30, j:j + 34]
        out = np.asarray(gaussian_blur(jnp.asarray(x), ksize=k, sigma=20.0))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_linear_fusion_covers_union(self):
        H, W = 40, 60
        ref_m = np.zeros((H, W), np.float32); ref_m[:, :40] = 1.0
        tgt_m = np.zeros((H, W), np.float32); tgt_m[:, 20:] = 1.0
        ref = np.full((H, W, 3), 200.0, np.float32) * ref_m[..., None]
        tgt = np.full((H, W, 3), 100.0, np.float32) * tgt_m[..., None]
        fused = np.asarray(linear_fusion(jnp.asarray(ref), jnp.asarray(tgt),
                                         jnp.asarray(ref_m), jnp.asarray(tgt_m)))
        # ref-only region keeps ref values, tgt-only keeps tgt values
        assert abs(fused[:, :10].mean() - 200.0) < 1.0
        assert abs(fused[:, 50:].mean() - 100.0) < 1.0
        # overlap transitions monotonically between the two
        mid = fused[:, 20:40, 0].mean(0)
        assert mid[0] > mid[-1]


class TestCompositor:
    def test_canvas_extent(self):
        mesh = jnp.asarray(np.stack(np.meshgrid(np.linspace(-20, 500, 9),
                                                np.linspace(10, 350, 7)),
                                    -1).astype(np.float32))[None]
        canvas = compute_canvas(mesh, mesh + 30.0, bucket=64)
        assert canvas.x_min == -20.0
        assert canvas.out_w == 550  # 530 - (-20)
        assert canvas.pad_w % 64 == 0 and canvas.pad_w >= canvas.out_w

    def test_pallas_gather_matches_xla_path(self):
        """composite with the Mosaic window-gather kernel (interpret mode
        on CPU) == the XLA packed-patch gather path, end to end, both
        download formats; no window-invariant warning on realistic
        meshes."""
        import warnings

        from stabstitch2_tpu.config import StitchConfig
        from stabstitch2_tpu.pipeline.compositor import composite_video

        rng = np.random.default_rng(5)
        T, H, W = 3, 96, 144
        i1 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        i2 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        xs, ys = np.linspace(0.0, W, 9), np.linspace(0.0, H, 7)
        base = np.stack(np.meshgrid(xs, ys), -1)[None]
        m1 = jnp.asarray((base + rng.normal(0, 2, (T, 7, 9, 2))
                          ).astype(np.float32))
        m2 = jnp.asarray((base + rng.normal(0, 2, (T, 7, 9, 2)) + 25.0
                          ).astype(np.float32))
        for fmt in ("bgr", "yuv420"):
            cfg = StitchConfig(canvas_bucket=32, download_format=fmt)
            from stabstitch2_tpu.pipeline import compositor as comp_mod

            with warnings.catch_warnings():
                warnings.simplefilter("error", RuntimeWarning)
                ref, cref = comp_mod.composite_finish(
                    comp_mod.composite_begin(i1, i2, m1, m2, config=cfg,
                                             chunk=2, model_size=(H, W),
                                             pallas_gather=False))
                got, cgot = comp_mod.composite_finish(
                    comp_mod.composite_begin(i1, i2, m1, m2, config=cfg,
                                             chunk=2, model_size=(H, W),
                                             pallas_gather=True))
            assert cref.out_h == cgot.out_h and cref.out_w == cgot.out_w
            # the gather planes are exact; only FMA contraction differs —
            # plus, on the yuv420 leg, the window-gather path quantizes to
            # uint8 BGR BEFORE converting (the chained two-program shape;
            # same semantics as the bgr download + mp4 writer), so bytes
            # may differ by 1 from the XLA leg's f32-source conversion
            np.testing.assert_allclose(got.astype(np.float32),
                                       ref.astype(np.float32), atol=1.0)
            if fmt == "bgr":
                frac_diff = (got != ref).mean()
                assert frac_diff < 0.01, frac_diff


    def test_pallas_gather_overflow_repairs_exactly(self):
        """A genuine window overflow (extreme downscale: one 8-row canvas
        block's live pixels span more source rows than the kernel's
        128-row window) must raise the flag — and composite_finish must
        transparently REPAIR the flagged chunks through the XLA gather,
        so the emitted frames are bit-identical to pallas_gather=False."""
        import warnings

        from stabstitch2_tpu.config import StitchConfig
        from stabstitch2_tpu.pipeline import compositor as comp_mod

        rng = np.random.default_rng(7)
        T, H, W = 2, 360, 480
        i1 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        i2 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        xs, ys = np.linspace(0.0, W, 9), np.linspace(0.0, H, 7)
        base = np.stack(np.meshgrid(xs, ys), -1)[None]
        # shrink the whole 360x480 image into a ~22x30 canvas: each 8-row
        # canvas block then spans ~130 source rows > the 126-row budget
        m1 = jnp.asarray(np.broadcast_to(base * 0.0625,
                                         (T, 7, 9, 2)).astype(np.float32))
        m2 = m1 + 2.0
        cfg = StitchConfig(canvas_bucket=32)
        ref, _ = comp_mod.composite_finish(
            comp_mod.composite_begin(i1, i2, m1, m2, config=cfg, chunk=2,
                                     model_size=(H, W),
                                     pallas_gather=False))
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            got, _ = comp_mod.composite_finish(
                comp_mod.composite_begin(i1, i2, m1, m2, config=cfg,
                                         chunk=2, model_size=(H, W),
                                         pallas_gather=True))
        msgs = [str(w.message) for w in wlist
                if issubclass(w.category, RuntimeWarning)]
        assert any("repaired exactly" in m for m in msgs), msgs
        np.testing.assert_array_equal(got, ref)


class TestYUV:
    def test_bgr_to_yuv420_matches_cv2(self):
        import cv2

        from stabstitch2_tpu.ops.yuv import bgr_to_yuv420, pack_i420

        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (2, 32, 40, 3)).astype(np.uint8)
        y, u, v = bgr_to_yuv420(jnp.asarray(img, jnp.float32))
        packed = np.asarray(pack_i420(y, u, v))
        for t in range(2):
            ref = cv2.cvtColor(img[t], cv2.COLOR_BGR2YUV_I420)
            np.testing.assert_allclose(packed[t].astype(int),
                                       ref.astype(int), atol=1)

    def test_composite_yuv420_roundtrips_to_bgr_path(self):
        import cv2

        rng = np.random.default_rng(0)
        T, H, W = 4, 64, 80
        i1 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        i2 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        xs, ys = np.linspace(0, W, 9), np.linspace(0, H, 7)
        base = np.stack(np.meshgrid(xs, ys), -1)[None]
        m1 = jnp.asarray((base + rng.normal(0, 1.5, (T, 7, 9, 2))
                          ).astype(np.float32))
        m2 = jnp.asarray((base + rng.normal(0, 1.5, (T, 7, 9, 2)) + 20
                          ).astype(np.float32))
        cfg_bgr = StitchConfig(canvas_bucket=16)
        cfg_yuv = StitchConfig(canvas_bucket=16, download_format="yuv420")
        bgr, canvas = composite_video(i1, i2, m1, m2, cfg_bgr, chunk=2,
                                      model_size=(H, W))
        i420, canvas2 = composite_video(i1, i2, m1, m2, cfg_yuv, chunk=2,
                                        model_size=(H, W))
        oh, ow = canvas.out_h // 2 * 2, canvas.out_w // 2 * 2
        assert i420.shape == (T, oh * 3 // 2, ow)
        # the returned Canvas must describe the frames actually emitted
        # (4:2:0 rounds odd extents down — regression: stale odd out_h/out_w)
        assert (canvas2.out_h, canvas2.out_w) == (oh, ow)
        for t in range(T):
            ref = cv2.cvtColor(bgr[t, :oh, :ow], cv2.COLOR_BGR2YUV_I420)
            # device converts from f32 pre-cast values, cv2 from uint8:
            # off-by-one rounding only
            np.testing.assert_allclose(i420[t].astype(int), ref.astype(int),
                                       atol=2)

    def test_i420_to_bgr_matches_cv2(self):
        import cv2

        from stabstitch2_tpu.ops.yuv import i420_to_bgr

        rng = np.random.default_rng(7)
        img = cv2.resize(rng.integers(0, 255, (16, 20, 3)).astype(np.uint8),
                         (160, 128), interpolation=cv2.INTER_CUBIC)
        i420 = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
        mine = np.asarray(i420_to_bgr(jnp.asarray(i420[None])))[0]
        ref = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420).astype(np.float32)
        np.testing.assert_allclose(mine, ref, atol=1)

    def test_i420_to_bgr_height_not_multiple_of_4(self):
        """cv2 packs U/V planes CONTIGUOUSLY: for H % 4 != 0 the U plane
        ends mid-row, so a row-sliced unpack misaligns chroma (regression:
        ops/yuv.py element-count split)."""
        import cv2

        from stabstitch2_tpu.ops.yuv import i420_to_bgr

        rng = np.random.default_rng(9)
        for H, W in ((6, 8), (10, 16), (350, 64)):
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            i420 = cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)
            mine = np.asarray(i420_to_bgr(jnp.asarray(i420[None])))[0]
            ref = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420).astype(np.float32)
            np.testing.assert_allclose(mine, ref, atol=1,
                                       err_msg=f"H={H} W={W}")

    def test_stitch_accepts_packed_i420_in_stream_and_lo_paths(self):
        """The stitch_arrays docstring advertises packed I420 for every
        upload mode; the stream path and the lo-provided path must unpack
        (regression: only the bulk lo=None branch handled ndim==3)."""
        from stabstitch2_tpu.data.video_io import bgr_to_i420

        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=8, height=mh, width=mw,
                                    overlap=0.6, shake_px=2.0, seed=5)
        p1, p2 = bgr_to_i420(v1), bgr_to_i420(v2)
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        st.upload_mode = "stream"
        r_stream = st.stitch_arrays(p1, None, p2, None)
        assert r_stream.frames.shape[0] == 8
        st.upload_mode = "bulk"
        lo1 = np.asarray(v1, np.float32) / 127.5 - 1.0
        lo2 = np.asarray(v2, np.float32) / 127.5 - 1.0
        r_lo = st.stitch_arrays(p1, lo1, p2, lo2)
        assert r_lo.frames.shape[0] == 8
        assert np.isfinite(r_lo.frames.astype(np.float32)).all()

    def test_stitch_accepts_packed_i420_uploads(self):
        from stabstitch2_tpu.data.video_io import bgr_to_i420

        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=8, height=mh, width=mw,
                                    overlap=0.6, shake_px=2.0, seed=5)
        stitcher = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                                 config=StitchConfig(canvas_bucket=32))
        r_bgr = stitcher.stitch_arrays(v1, None, v2, None)
        r_i420 = stitcher.stitch_arrays(bgr_to_i420(v1), None,
                                        bgr_to_i420(v2), None)
        # same geometry up to the 4:2:0 chroma roundtrip of the inputs
        # (the synthetic texture is chroma-saturated noise — the worst case
        # for 2x2 chroma decimation; real JPEG frames are 4:2:0 already)
        assert r_i420.canvas.out_w == pytest.approx(r_bgr.canvas.out_w, abs=4)
        dm = np.abs(np.asarray(r_i420.smooth_mesh1)
                    - np.asarray(r_bgr.smooth_mesh1))
        assert dm.max() < 3.0  # px, model res
        d = np.abs(r_i420.frames.astype(np.float32)
                   - r_bgr.frames.astype(np.float32))
        assert d.mean() < 8.0

    def test_write_video_i420(self, tmp_path):
        import cv2

        from stabstitch2_tpu.data.video_io import write_video

        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (5, 96, 64), dtype=np.uint8)  # 64x64
        out = str(tmp_path / "yuv.mp4")
        write_video(out, frames, frame_format="i420")
        cap = cv2.VideoCapture(out)
        ok, frame = cap.read()
        assert ok and frame.shape == (64, 64, 3)


@pytest.mark.integration
class TestEndToEnd:
    def test_stitch_synthetic_clip(self, tmp_path):
        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=8, height=mh, width=mw,
                                    overlap=0.6, shake_px=2.0, seed=5)
        stitcher = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                                 config=StitchConfig(canvas_bucket=32))
        lo1 = v1.astype(np.float32) / 127.5 - 1.0
        lo2 = v2.astype(np.float32) / 127.5 - 1.0
        result = stitcher.stitch_arrays(v1, lo1, v2, lo2)
        T = len(v1)
        assert result.frames.shape[0] == T
        assert result.frames.shape[1] >= mh and result.frames.shape[2] >= mw
        assert np.isfinite(result.frames).all()
        assert result.frames.max() > 10.0  # non-trivial content
        assert set(result.fps) >= {"upload", "spatial", "temporal", "smooth",
                                   "warp_fuse", "download", "composite"}
        # canvas is global: every frame same size
        assert result.canvas.out_h == result.frames.shape[1]

    def test_stitch_video_dir_writes_mp4(self, tmp_path):
        from synthetic import write_clip_dirs
        mh, mw = 128, 160
        vd = write_clip_dirs(str(tmp_path), num_frames=7, height=mh, width=mw,
                             seed=1)
        stitcher = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                                 config=StitchConfig(canvas_bucket=32))
        out = str(tmp_path / "out.mp4")
        result = stitcher.stitch_video_dir(vd, out)
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 1000
        assert "encode" in result.fps


class TestNativeLoader:
    @pytest.fixture(scope="class")
    def libbuilt(self):
        import subprocess
        from stabstitch2_tpu.data import native
        if not native.available():
            root = __import__("pathlib").Path(__file__).parent.parent
            r = subprocess.run(["make", "-C", str(root / "native")],
                               capture_output=True)
            native._TRIED = False  # re-probe
            if r.returncode != 0 or not native.available():
                pytest.skip("native frameloader unavailable")
        return True

    def test_decode_matches_cv2(self, libbuilt, tmp_path):
        import cv2
        from synthetic import make_two_view_clip
        from stabstitch2_tpu.data import native

        v1, _ = make_two_view_clip(num_frames=3, height=90, width=120, seed=7)
        paths = []
        for t in range(3):
            p = str(tmp_path / f"{t}.jpg")
            cv2.imwrite(p, v1[t], [cv2.IMWRITE_JPEG_QUALITY, 95])
            paths.append(p)
        hi, lo = native.decode_batch(paths, lo_size=(45, 60))
        assert hi.shape == (3, 90, 120, 3) and lo.shape == (3, 45, 60, 3)
        ref = np.stack([cv2.imread(p) for p in paths])
        # different JPEG IDCT implementations: allow small per-pixel delta
        assert np.mean(np.abs(hi.astype(int) - ref.astype(int))) < 1.5
        assert np.max(np.abs(hi.astype(int) - ref.astype(int))) <= 24
        ref_lo = np.stack([cv2.resize(r, (60, 45)) for r in ref])
        assert np.mean(np.abs(lo.astype(int) - ref_lo.astype(int))) < 2.0

    def test_prefetcher_in_order(self, libbuilt, tmp_path):
        import cv2
        from synthetic import make_two_view_clip
        from stabstitch2_tpu.data.native import FramePrefetcher

        v1, _ = make_two_view_clip(num_frames=6, height=64, width=80, seed=8)
        paths = []
        for t in range(6):
            p = str(tmp_path / f"{t}.jpg")
            cv2.imwrite(p, v1[t])
            paths.append(p)
        with FramePrefetcher(paths, lo_size=(32, 40), ring=3) as pf:
            frames = [pf.get(i) for i in range(6)]
        assert all(f[0].shape == (64, 80, 3) for f in frames)
        assert all(f[1].shape == (32, 40, 3) for f in frames)
        # frames differ from each other (ring slots not aliased)
        assert not np.array_equal(frames[0][0], frames[5][0])


class TestCanvasPaddingInvariance:
    def test_padding_does_not_change_pixels(self):
        # identical crops regardless of bucket size: the padded grid must
        # keep the true canvas's normalization (TPS is not invariant under
        # anisotropic rescaling)
        from stabstitch2_tpu.pipeline.compositor import composite_video
        from stabstitch2_tpu.config import StitchConfig

        rng = np.random.default_rng(0)
        T, H, W = 2, 90, 120
        img1 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        img2 = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
        xs = np.linspace(0, 120, 9)
        ys = np.linspace(0, 90, 7)
        base = np.stack(np.meshgrid(xs, ys), -1)[None]
        m1 = jnp.asarray((base + rng.normal(0, 3, (T, 7, 9, 2))
                          ).astype(np.float32))
        m2 = jnp.asarray((base + rng.normal(0, 3, (T, 7, 9, 2)) + 20
                          ).astype(np.float32))
        f_small, c_small = composite_video(
            img1, img2, m1, m2, chunk=2, model_size=(H, W),
            config=StitchConfig(canvas_bucket=1))
        f_big, c_big = composite_video(
            img1, img2, m1, m2, chunk=2, model_size=(H, W),
            config=StitchConfig(canvas_bucket=64))
        assert (c_small.out_h, c_small.out_w) == (c_big.out_h, c_big.out_w)
        assert c_big.pad_h > c_small.pad_h  # padding actually differs
        np.testing.assert_array_equal(f_small, f_big)


class TestConfigCombos:
    def test_fast_warp_linear_fusion_end_to_end(self):
        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=7, height=mh, width=mw,
                                    overlap=0.6, shake_px=2.0, seed=31)
        stitcher = init_stitcher(
            rng_seed=0, model_h=mh, model_w=mw, chunk=4,
            config=StitchConfig(canvas_bucket=32, warp_mode="FAST",
                                fusion_mode="LINEAR"))
        result = stitcher.stitch_arrays(v1, None, v2, None)  # uint8 fast path
        assert result.frames.shape[0] == 7
        assert np.isfinite(result.frames.astype(np.float32)).all()
        assert result.frames.max() > 10


class TestErrorPaths:
    def test_too_short_video_raises(self):
        v1, v2 = make_two_view_clip(num_frames=3, height=128, width=160)
        stitcher = init_stitcher(rng_seed=0, model_h=128, model_w=160)
        with pytest.raises(ValueError, match="too short"):
            stitcher.stitch_arrays(v1, None, v2, None)

    def test_missing_frames_dir_raises(self, tmp_path):
        from stabstitch2_tpu.data.video_io import load_view
        with pytest.raises(FileNotFoundError):
            load_view(str(tmp_path), "video1")

    def test_cli_stitch_empty_dataset(self, tmp_path):
        from stabstitch2_tpu.cli import main
        rc = main(["stitch", "--test_path", str(tmp_path),
                   "--output_path", str(tmp_path / "out")])
        assert rc == 1

    def test_missing_checkpoint_dirs(self, tmp_path):
        from stabstitch2_tpu.utils.checkpoint import stitcher_from_checkpoint
        with pytest.raises(FileNotFoundError):
            stitcher_from_checkpoint(ckpt_dir=str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError):
            stitcher_from_checkpoint(reference_pth_dir=str(tmp_path))


class TestDeterminismAndShapes:
    def test_stitch_deterministic(self):
        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=7, height=mh, width=mw,
                                    seed=41)
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        r1 = st.stitch_arrays(v1, None, v2, None)
        r2 = st.stitch_arrays(v1, None, v2, None)
        np.testing.assert_array_equal(r1.frames, r2.frames)

    def test_no_phase_sync_matches_synced(self):
        """sync_phases=False (enqueue-whole-video mode, used by bench and
        cli --no_phase_sync) must produce identical frames — the syncs are
        attribution only, never a correctness dependency."""
        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=8, height=mh, width=mw,
                                    seed=13)
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        r_sync = st.stitch_arrays(v1, None, v2, None)
        st.sync_phases = False
        r_nosync = st.stitch_arrays(v1, None, v2, None)
        np.testing.assert_array_equal(r_sync.frames, r_nosync.frames)

    def test_varied_video_lengths_one_stitcher(self):
        mh, mw = 128, 160
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        for T, seed in ((7, 1), (10, 2)):
            v1, v2 = make_two_view_clip(num_frames=T, height=mh, width=mw,
                                        seed=seed)
            r = st.stitch_arrays(v1, None, v2, None)
            assert r.frames.shape[0] == T

    def test_smooth_bucket_padding_is_exact(self):
        # T=9 pads to the 16-frame smooth bucket; kept frames must equal
        # the unpadded smoothing (end-padding never reaches frame t <= T)
        from stabstitch2_tpu.pipeline.smoothing import smooth_all_windows
        from stabstitch2_tpu.pipeline.transport import (
            stitched_meshes,
            transport_both_views,
        )

        mh, mw = 128, 160
        T = 9
        v1, v2 = make_two_view_clip(num_frames=T, height=mh, width=mw,
                                    seed=17)
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        r = st.stitch_arrays(v1, None, v2, None)
        # recompute the smooth meshes with NO padding, straight through the
        # same building blocks
        lo1 = st._preprocess(jnp.asarray(v1), mh, mw)
        lo2 = st._preprocess(jnp.asarray(v2), mh, mw)
        sm1, sm2 = st._motion.spatial(lo1, lo2)
        tm1 = st._motion.temporal(lo1)
        tm2 = st._motion.temporal(lo2)
        ts1, ts2 = transport_both_views(tm1, sm1, tm2, sm2, mh, mw)
        ref = smooth_all_windows(st.smooth_net, st.smooth_vars,
                                 stitched_meshes(sm1, mh, mw),
                                 stitched_meshes(sm2, mh, mw), ts1, ts2,
                                 window=st.config.window)
        np.testing.assert_allclose(np.asarray(r.smooth_mesh1),
                                   np.asarray(ref["smooth_mesh1"]),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.integration
class TestFusedMotionParity:
    def test_motion_fused_matches_eager_drivers(self):
        """_motion_fused (one lax.map program) == the eager chunked
        spatial/temporal drivers the stitch path uses, bit-for-bit (same
        nets, same chunking, same batch shapes per chunk)."""
        from stabstitch2_tpu.pipeline.stitcher import init_stitcher

        mh, mw = 128, 160
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4)
        rng = np.random.default_rng(31)
        T = 12  # divisible by chunk (the fused path's contract)
        lo1 = jnp.asarray(rng.uniform(-1, 1, (T, mh, mw, 3)), jnp.float32)
        lo2 = jnp.asarray(rng.uniform(-1, 1, (T, mh, mw, 3)), jnp.float32)

        sm1f, sm2f, tm1f, tm2f = st._motion_fused(
            st.spatial_vars, st.temporal_vars, lo1, lo2)
        sm1, sm2 = st._motion.spatial(lo1, lo2)
        tm1, tm2 = st._motion.temporal_pair(lo1, lo2)
        for got, want, name in ((sm1f, sm1, "sm1"), (sm2f, sm2, "sm2"),
                                (tm1f, tm1, "tm1"), (tm2f, tm2, "tm2")):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, err_msg=name)

    def test_fused_motion_stitch_matches_eager(self):
        """stitch_arrays with fused_motion=True == the eager phase path."""
        from stabstitch2_tpu.config import StitchConfig
        from stabstitch2_tpu.pipeline.stitcher import init_stitcher

        mh, mw = 128, 160
        v1, v2 = make_two_view_clip(num_frames=9, height=mh, width=mw,
                                    seed=37)
        cfg = StitchConfig(canvas_bucket=32)
        st = init_stitcher(rng_seed=0, model_h=mh, model_w=mw, chunk=4,
                           config=cfg)
        st.fused_motion = False   # eager leg (fused is the default)
        ref = st.stitch_arrays(v1, None, v2, None)
        st.fused_motion = True
        got = st.stitch_arrays(v1, None, v2, None)
        assert got.frames.shape == ref.frames.shape
        # meshes agree to float noise (the two paths compile the same math
        # differently — under the 8-virtual-device CPU env the conv
        # reduction partitioning differs by ~1e-4)...
        for k in ("smooth_mesh1", "smooth_mesh2"):
            dm = np.abs(np.asarray(getattr(got, k))
                        - np.asarray(getattr(ref, k)))
            assert dm.max() < 2e-3, f"{k} delta {dm.max()}"
        # ...and a 1e-4 px mesh shift can flip a bilinear cell at a content
        # edge, so individual uint8 pixels may jump: assert statistically
        d = np.abs(got.frames.astype(np.int16) - ref.frames.astype(np.int16))
        assert d.mean() < 0.5, f"mean uint8 delta {d.mean()}"
        assert (d > 2).mean() < 0.01, f"{(d > 2).mean():%} pixels differ >2"
