"""Streaming stitcher: per-frame emission + equivalence with batch meshes."""

import numpy as np
import jax.numpy as jnp

from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.pipeline.online import OnlineStitcher
from stabstitch2_tpu.pipeline.stitcher import init_stitcher

from synthetic import make_two_view_clip

MH, MW = 128, 160


class TestOnlineStitcher:
    def test_latency_and_counts(self):
        T = 10
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=21)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        online = OnlineStitcher(st)
        emitted = []
        per_push = []
        for t in range(T):
            outs = online.push(v1[t], v2[t])
            per_push.append(len(outs))
            emitted += outs
        # nothing until the first full window, then 7 at once, then 1/frame
        assert per_push[:6] == [0] * 6
        assert per_push[6] == 7
        assert per_push[7:] == [1] * (T - 7)
        assert len(emitted) == T
        shapes = {e.shape for e in emitted}
        assert len(shapes) == 1  # constant canvas
        assert all(np.isfinite(e.astype(np.float32)).all() for e in emitted)

    def test_meshes_match_batch_pipeline(self):
        T = 9
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=22)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        lo1 = v1.astype(np.float32) / 127.5 - 1.0
        lo2 = v2.astype(np.float32) / 127.5 - 1.0
        batch = st.stitch_arrays(v1, lo1, v2, lo2)

        online = OnlineStitcher(st)
        for t in range(T):
            online.push(v1[t], v2[t])
        # the streaming smooth mesh of the LAST frame (fused step's window
        # output, exposed as window_smooth) must match the batch pipeline
        sm1w, _ = online.window_smooth
        np.testing.assert_allclose(np.asarray(sm1w[-1]),
                                   np.asarray(batch.smooth_mesh1[-1]),
                                   rtol=1e-3, atol=5e-3)


class TestI420Emission:
    def test_i420_matches_bgr_luma(self):
        """emit_format='i420' returns packed 4:2:0 planes; converting back
        to BGR must match the BGR emission path up to 4:2:0 quantization."""
        import cv2

        T = 8
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=27)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        bgr_out, i420_out = [], []
        for fmt, sink in (("bgr", bgr_out), ("i420", i420_out)):
            o = OnlineStitcher(st, emit_format=fmt)
            for t in range(T):
                sink += o.push(v1[t], v2[t])
            if fmt == "i420":  # Canvas must describe the emitted frames
                assert sink[-1].shape == (o.canvas.out_h * 3 // 2,
                                          o.canvas.out_w)
        assert len(bgr_out) == len(i420_out) == T
        for b, p in zip(bgr_out, i420_out):
            oh, ow = p.shape[0] * 2 // 3, p.shape[1]
            # the i420 canvas rounds odd extents UP to even, so compare the
            # common region only (bgr canvas may be one row/col smaller)
            ch, cw = min(oh, b.shape[0]), min(ow, b.shape[1])
            back = cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420)
            diff = np.abs(back[:ch, :cw].astype(np.int16)
                          - b[:ch, :cw].astype(np.int16))
            # 4:2:0 chroma subsampling error is large on noise-like
            # synthetic texture; the decoded round trip must stay close
            # (the encoder itself is golden-tested in test_pipeline)
            assert diff.mean() < 6.0, diff.mean()
            assert np.median(diff) <= 3, np.median(diff)


class TestI420Input:
    def test_push_accepts_packed_i420_frames(self):
        """push() takes camera-native packed 4:2:0 frames; meshes must
        match the BGR input path up to the chroma-subsampling round trip
        of the inputs."""
        from stabstitch2_tpu.data.video_io import bgr_to_i420

        T = 8
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=2.0, seed=29)
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        o_bgr = OnlineStitcher(st)
        o_i420 = OnlineStitcher(st)
        p1, p2 = bgr_to_i420(v1), bgr_to_i420(v2)
        out_bgr, out_i420 = [], []
        for t in range(T):
            out_bgr += o_bgr.push(v1[t], v2[t])
            out_i420 += o_i420.push(p1[t], p2[t])
        assert len(out_bgr) == len(out_i420) == T
        m_bgr = np.asarray(o_bgr.window_smooth[0][-1])
        m_i420 = np.asarray(o_i420.window_smooth[0][-1])
        assert np.abs(m_bgr - m_i420).max() < 3.0  # px, model res
        # emitted PIXELS must match too (up to the inputs' own 4:2:0
        # chroma round trip — large on synthetic noise texture): guards
        # the device-unpack -> composite seam, not just the geometry
        for fb, fi in zip(out_bgr, out_i420):
            ch = min(fb.shape[0], fi.shape[0])
            cw = min(fb.shape[1], fi.shape[1])
            d = np.abs(fb[:ch, :cw].astype(np.int16)
                       - fi[:ch, :cw].astype(np.int16))
            assert d.mean() < 8.0, d.mean()

    def test_push_rejects_non_i420_2d_frames(self):
        import pytest

        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        o = OnlineStitcher(st)
        gray = np.zeros((MH, MW), np.uint8)  # H not a multiple of 3
        with pytest.raises(ValueError, match="not packed I420"):
            o.push(gray, gray)
        with pytest.raises(ValueError, match="expected"):
            o.push(np.zeros((MH, MW, 4), np.uint8),
                   np.zeros((MH, MW, 4), np.uint8))


class TestCanvasReanchor:
    """Drift beyond the causal canvas re-anchors instead of silently
    cropping (pipeline/online.py:_reanchor)."""

    def _online(self):
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        return OnlineStitcher(st)

    def _mesh(self, dx=0.0, dy=0.0, scale=1.0):
        xs = np.linspace(0, MW, 9) * scale + dx
        ys = np.linspace(0, MH, 7) * scale + dy
        return jnp.asarray(np.stack(np.meshgrid(xs, ys), -1)[None]
                           .astype(np.float32))

    def test_pan_shifts_anchor_same_program(self):
        o = self._online()
        o._establish_canvas(self._mesh(), self._mesh(dx=30), MH, MW)
        c0 = o.canvas
        # drift far right: content out of canvas -> shift, same padded shape
        img = np.zeros((MH, MW, 3), np.uint8)
        o._composite_one(img, img, self._mesh(dx=500)[0],
                         self._mesh(dx=530)[0])
        assert o.reanchor_frames == [0]
        assert (o.canvas.pad_h, o.canvas.pad_w) == (c0.pad_h, c0.pad_w)
        assert (o.canvas.out_h, o.canvas.out_w) == (c0.out_h, c0.out_w)
        assert o.canvas.x_min > c0.x_min + 300

    def test_growth_reestablishes_canvas(self):
        o = self._online()
        o._establish_canvas(self._mesh(), self._mesh(dx=30), MH, MW)
        c0 = o.canvas
        img = np.zeros((MH, MW, 3), np.uint8)
        # zoom out: content twice the canvas -> grow
        o._composite_one(img, img, self._mesh(scale=2.5)[0],
                         self._mesh(scale=2.5, dx=40)[0])
        assert o.reanchor_frames == [0]
        assert o.canvas.out_w > c0.out_w

    def test_streaming_survives_drift(self):
        # margin 1.0: any jitter beyond the first window's extents triggers
        # re-anchoring mid-stream; emission must continue with valid frames
        st = init_stitcher(rng_seed=0, model_h=MH, model_w=MW, chunk=4,
                           config=StitchConfig(canvas_bucket=32))
        o = OnlineStitcher(st, canvas_margin=1.0)
        T = 10
        v1, v2 = make_two_view_clip(num_frames=T, height=MH, width=MW,
                                    overlap=0.6, shake_px=4.0, seed=31)
        emitted = []
        for t in range(T):
            emitted += o.push(v1[t], v2[t])
        assert len(emitted) == T
        assert all(np.isfinite(e.astype(np.float32)).all() for e in emitted)
