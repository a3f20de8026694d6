"""True streaming (online) stitcher: push frame pairs, emit panoramas.

The reference is *algorithmically* online (sliding 7-frame window,
test_online_ssd.py:359-392) but its driver is offline — it loads the whole
video, and even sizes the output canvas from ALL frames' meshes
(test_online_ssd.py:106-120, non-causal). This module provides the real
streaming deployment mode:

- ONE fused jitted step per frame (preprocess, spatial pair, temporal
  features with a cached previous-frame feature like
  temporal_network.py:129-146, transport, window roll, full-window smooth),
  plus one composite dispatch — the per-frame latency through a remote
  tunnel is dispatch-round-trip-bound, so the step count is the latency;
- 6-frame latency: frame t's stabilized panorama is emitted once window
  [t-6, t] is full (frames 0..5 are emitted together with frame 6);
- a CAUSAL canvas: fixed from the first window's mesh extents times a
  margin factor, bucketed. This is the one deliberate deviation from the
  reference (documented in PARITY.md) — a causal system cannot know future
  mesh extents.

Batch-mode equivalence of the meshes is tested in
tests/test_online_mode.py (streaming vs pipeline smooth meshes).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.config import StitchConfig, WINDOW
from stabstitch2_tpu.models.smooth import smooth_outputs
from stabstitch2_tpu.models.spatial import spatial_motions
from stabstitch2_tpu.models.temporal import TemporalNet as _TN
from stabstitch2_tpu.ops.mesh import (
    denormalize_mesh,
    mesh_points,
    normalize_mesh,
    points_mesh,
    rigid_mesh,
)
from stabstitch2_tpu.ops.tps import (
    tps_params_shared_source,
    tps_transform_points,
)
from stabstitch2_tpu.pipeline.compositor import (
    Canvas,
    _composite_chunk,
    scale_meshes,
)


class OnlineStitcher:
    """Streaming two-view stitcher with a 6-frame emission latency."""

    def __init__(self, stitcher, canvas_margin: float = 1.25,
                 emit_format: str = "bgr"):
        """emit_format: 'bgr' returns [oh, ow, 3] uint8 frames; 'i420'
        returns packed 4:2:0 [oh*3//2, ow] uint8 (encoder-native, half the
        device->host bytes — the right choice when the consumer is a video
        encoder and the chip link is the latency floor)."""
        assert emit_format in ("bgr", "i420"), emit_format
        self.s = stitcher
        self.canvas_margin = canvas_margin
        self.emit_format = emit_format
        self.cfg: StitchConfig = stitcher.config
        # same auto policy as compositor.composite_begin: the ONE-program
        # fused warp kernel on a single real TPU device (round 5; the v2
        # window gather only when the fused path is off); the viol flag
        # rides the per-push fetch (with the extents) so a rare overflow
        # repairs by re-dispatching that batch through the XLA gather
        pf = getattr(self.cfg, "pallas_fused", None)
        if pf is None:
            pf = (self.cfg.warp_mode == "NORMAL"
                  and getattr(self.cfg, "coord_stride", 1) == 1
                  and jax.default_backend() == "tpu"
                  and stitcher.mesh is None)
        self._pallas_fused = bool(pf)
        pg = getattr(self.cfg, "pallas_gather", None)
        if pg is None:
            pg = (not self._pallas_fused
                  and self.cfg.warp_mode == "NORMAL"
                  and jax.default_backend() == "tpu"
                  and stitcher.mesh is None)
        self._pallas_gather = bool(pg)
        mh, mw = stitcher.model_h, stitcher.model_w
        self.mh, self.mw = mh, mw

        net_s, net_t, net_m = (stitcher.spatial_net, stitcher.temporal_net,
                               stitcher.smooth_net)

        rigid = rigid_mesh(mh, mw)
        norm_rigid_pts = mesh_points(normalize_mesh(rigid, mh, mw))

        def _transport(tmotion, smesh_prev, smesh_cur):
            tgt = mesh_points(normalize_mesh(smesh_prev, mh, mw))[None]
            Tc = tps_params_shared_source(norm_rigid_pts, tgt)
            tmesh = normalize_mesh(rigid + tmotion, mh, mw)
            pts = mesh_points(tmesh)[None]
            out = tps_transform_points(pts, norm_rigid_pts[None], tgt, T=Tc)
            out = points_mesh(out[0], grid_h=rigid.shape[0] - 1,
                              grid_w=rigid.shape[1] - 1)
            return denormalize_mesh(out, mh, mw) - smesh_cur

        @jax.jit
        def _step(svars, tvars, mvars, hi_pair_u8, prev_feat, prev_smesh1,
                  prev_smesh2, buf_smesh1, buf_smesh2, buf_ts1, buf_ts2,
                  first):
            """One streaming frame, fused: the whole motion+smooth chain is
            a single device program so a push costs one dispatch round trip
            (plus the composite), not ~10."""
            if hi_pair_u8.ndim == 3:  # packed I420 [2, H*3//2, W]
                from stabstitch2_tpu.ops.yuv import unpack_i420_u8

                hi_pair_u8 = unpack_i420_u8(hi_pair_u8)
            lo = hi_pair_u8.astype(jnp.float32)
            if hi_pair_u8.shape[1] != mh or hi_pair_u8.shape[2] != mw:
                lo = jax.image.resize(lo, (2, mh, mw, 3), "bilinear")
            lo = lo / 127.5 - 1.0
            f1, f2 = lo[0:1], lo[1:2]

            off, mref, mtgt = net_s.apply(svars, f1, f2, False)
            sp = spatial_motions(off, mref, mtgt, mh, mw)
            smesh1 = rigid + sp["motion1"][0]
            smesh2 = rigid + sp["motion2"][0]

            feat = net_t.apply(tvars, lo, False, method=_TN.features)
            tm1 = net_t.apply(tvars, prev_feat[0:1], feat[0:1],
                              method=_TN.motion_from_features)[0]
            tm2 = net_t.apply(tvars, prev_feat[1:2], feat[1:2],
                              method=_TN.motion_from_features)[0]
            # first frame has no predecessor: zero trajectory (the transport
            # is computed anyway — prev_smesh inits to rigid, non-degenerate)
            ts1 = jnp.where(first, 0.0, _transport(tm1, prev_smesh1, smesh1))
            ts2 = jnp.where(first, 0.0, _transport(tm2, prev_smesh2, smesh2))

            buf_smesh1 = jnp.concatenate([buf_smesh1[1:], smesh1[None]])
            buf_smesh2 = jnp.concatenate([buf_smesh2[1:], smesh2[None]])
            buf_ts1 = jnp.concatenate([buf_ts1[1:], ts1[None]])
            buf_ts2 = jnp.concatenate([buf_ts2[1:], ts2[None]])

            # window's first trajectory is zeroed per window (reference
            # semantics: each window re-bases at its first frame)
            raw = net_m.apply(mvars, buf_smesh1[None], buf_smesh2[None],
                              buf_ts1.at[0].set(0.0)[None],
                              buf_ts2.at[0].set(0.0)[None])
            d = smooth_outputs(raw)
            # hi_pair_u8 (unpacked BGR) is returned so the composite reads
            # the DEVICE copy — frames cross the host->device link exactly
            # once per push, in whichever format the producer supplied
            return (feat, smesh1, smesh2, buf_smesh1, buf_smesh2, buf_ts1,
                    buf_ts2, d["smooth_mesh1"][0], d["smooth_mesh2"][0],
                    hi_pair_u8)

        self._step = _step
        self._rigid = rigid
        # features are stage1 output: [2, ceil(H/8), ceil(W/8), 128] in the
        # temporal net's compute dtype (bf16 by default) — the zero init
        # must match shape AND dtype or the steady state would retrace
        # (each stride-2 stage is a ceil-halving, so ceil(x/8) overall)
        self._feat_shape = (2, -(-mh // 8), -(-mw // 8), 128)
        self._feat_dtype = getattr(net_t, "dtype", jnp.float32)
        self.reset()

    def reset(self):
        self._t = 0
        self._prev_feat = jnp.zeros(self._feat_shape, self._feat_dtype)
        self._prev_smesh1 = self._rigid
        self._prev_smesh2 = self._rigid
        gh1, gw1 = self._rigid.shape[0], self._rigid.shape[1]
        zbuf = jnp.zeros((WINDOW, gh1, gw1, 2), jnp.float32)
        self._buf_smesh1 = zbuf
        self._buf_smesh2 = zbuf
        self._buf_ts1 = zbuf
        self._buf_ts2 = zbuf
        self._pending_hi: List = []
        self.canvas: Optional[Canvas] = None
        self._offset = None
        # current window's smoothed meshes — valid once the window is full
        self.window_smooth = None
        # frame indices where the causal canvas was re-anchored (camera
        # drifted beyond the first-window extents + margin)
        self.reanchor_frames: List[int] = []

    # ------------------------------------------------------------------

    def _establish_canvas(self, mesh1, mesh2, img_h, img_w):
        m = np.asarray(jnp.stack([mesh1, mesh2]))
        cx = (m[..., 0].min() + m[..., 0].max()) / 2.0
        cy = (m[..., 1].min() + m[..., 1].max()) / 2.0
        half_w = (m[..., 0].max() - m[..., 0].min()) / 2.0 * self.canvas_margin
        half_h = (m[..., 1].max() - m[..., 1].min()) / 2.0 * self.canvas_margin
        bucket = self.cfg.canvas_bucket
        out_w = int(np.ceil(2 * half_w))
        out_h = int(np.ceil(2 * half_h))
        if self.emit_format == "i420":
            # 4:2:0 needs even dims: round UP so the Canvas describes the
            # emitted frames exactly and no content row/col is cropped
            out_w += out_w % 2
            out_h += out_h % 2
        pad_w = -(-out_w // bucket) * bucket
        pad_h = -(-out_h // bucket) * bucket
        self.canvas = Canvas(out_h=out_h, out_w=out_w, pad_h=pad_h,
                             pad_w=pad_w, x_min=float(cx - half_w),
                             y_min=float(cy - half_h))
        self._offset = jnp.asarray([self.canvas.x_min, self.canvas.y_min],
                                   jnp.float32)

    def _reanchor(self, m1, m2):
        """Camera drifted beyond the canvas: re-center on current content.

        If the content still fits the existing output size, only the anchor
        shifts — the padded shape (and thus the compiled composite program)
        is unchanged, so a pan costs nothing. Only genuine growth (content
        larger than the canvas) recompiles for a bigger bucket.
        """
        m = np.asarray(jnp.stack([m1, m2]))
        need_w = (m[..., 0].max() - m[..., 0].min()) * self.canvas_margin
        need_h = (m[..., 1].max() - m[..., 1].min()) * self.canvas_margin
        c = self.canvas
        if need_w <= c.out_w and need_h <= c.out_h:
            cx = (m[..., 0].min() + m[..., 0].max()) / 2.0
            cy = (m[..., 1].min() + m[..., 1].max()) / 2.0
            self.canvas = Canvas(out_h=c.out_h, out_w=c.out_w,
                                 pad_h=c.pad_h, pad_w=c.pad_w,
                                 x_min=float(cx - c.out_w / 2.0),
                                 y_min=float(cy - c.out_h / 2.0))
            self._offset = jnp.asarray(
                [self.canvas.x_min, self.canvas.y_min], jnp.float32)
        else:
            self._establish_canvas(m1, m2, 0, 0)
        self.reanchor_frames.append(self._t)

    def _enqueue_composite(self, hi1, hi2, m1, m2, pallas_gather=None,
                           pallas_fused=None):
        """Dispatch one BATCH of composites against the CURRENT canvas and
        return (cropped device planes, device extents, viol flag) without
        any host sync — the caller fetches everything together (one round
        trip; the viol flag rides that same fetch for free). Two compiled
        programs exist per stream: B=1 (steady state, every push) and
        B=WINDOW (the first-window burst, once)."""
        c = self.canvas
        if pallas_gather is None:
            pallas_gather = self._pallas_gather
        if pallas_fused is None:
            pallas_fused = self._pallas_fused
        # chained yuv420 on the v2 window-gather path only: the fused
        # kernel's in-program yuv is faster than the chain (round 5)
        chain_yuv = (self._pallas_gather and not self._pallas_fused
                     and self.emit_format == "i420")
        fmt = ("yuv420" if self.emit_format == "i420" and not chain_yuv
               else "bgr")
        fused, viol = _composite_chunk(
            jnp.asarray(hi1), jnp.asarray(hi2), m1, m2,
            self._offset, (c.pad_h, c.pad_w),
            self.cfg.warp_mode, self.cfg.fusion_mode,
            grid_span=(c.out_h, c.out_w),
            out_format=fmt,
            pallas_gather=pallas_gather,
            pallas_fused=pallas_fused,
            # under dp the coords kernel must be shard_mapped, never a
            # bare pallas_call on sharded inputs (B=1/WINDOW rarely
            # divides the axis, so this usually selects the jnp path)
            shard_mesh=self.s.mesh)
        if chain_yuv:
            from stabstitch2_tpu.ops.yuv import bgr_u8_to_yuv420_jit

            fused = bgr_u8_to_yuv420_jit(fused)
        oh, ow = self._emit_hw()
        if self.emit_format == "i420":
            yp, up, vp = fused
            planes = (yp[:, :oh, :ow], up[:, :oh // 2, :ow // 2],
                      vp[:, :oh // 2, :ow // 2])
        else:
            planes = (fused[:, :oh, :ow],)
        m = jnp.stack([m1, m2])
        ext = jnp.stack([m[..., 0].min(), m[..., 0].max(),
                         m[..., 1].min(), m[..., 1].max()])
        for p in planes:  # start d2h under any remaining compute
            try:
                p.copy_to_host_async()
            except AttributeError:
                pass
        return planes, ext, viol

    def _emit_hw(self):
        c = self.canvas
        if self.emit_format == "i420":  # 4:2:0 needs even dims
            return c.out_h // 2 * 2, c.out_w // 2 * 2
        return c.out_h, c.out_w

    def _pack(self, planes_host) -> np.ndarray:
        if self.emit_format == "i420":
            from stabstitch2_tpu.data.video_io import pack_i420_host

            return pack_i420_host(*planes_host)
        return np.asarray(planes_host[0])

    def _ext_fits(self, ext) -> bool:
        c = self.canvas
        return bool(ext[0] >= c.x_min and ext[1] <= c.x_min + c.out_w
                    and ext[2] >= c.y_min and ext[3] <= c.y_min + c.out_h)

    def _composite_many(self, his1, his2, meshes1, meshes2
                        ) -> List[np.ndarray]:
        """Composite a batch of frames with ONE dispatch + ONE fetch.

        his*: [B, H, W, 3] uint8; meshes*: [B, GH+1, GW+1, 2] model-res.
        OPTIMISTIC: dispatched against the current anchor with no host
        sync; the extents ride the same device_get as the frames and only
        actual drift (rare) re-anchors and recomposites the batch."""
        B, H, W = his1.shape[0], his1.shape[1], his1.shape[2]
        m1 = scale_meshes(meshes1, H, W, self.mh, self.mw)
        m2 = scale_meshes(meshes2, H, W, self.mh, self.mw)
        if self.canvas is None:
            self._establish_canvas(m1, m2, H, W)
        # ONE batched dispatch + ONE fetch, whatever B is. Through a
        # remote tunnel each dispatch is a ~100 ms round trip, so the
        # first-window burst (B=7) as per-frame dispatches would cost ~7
        # round trips — batching it is most of the burst. Cost: a second
        # compiled composite program (B=WINDOW, used once per stream) next
        # to the steady-state B=1 program.
        def run(pg=None, pf=None):
            fetched = jax.device_get(
                [self._enqueue_composite(his1, his2, m1, m2,
                                         pallas_gather=pg,
                                         pallas_fused=pf)])
            if pg is None and any(bool(v) for _, _, v in fetched):
                # rare window-gather overflow (exact zeros, flagged):
                # repair by re-dispatching through the XLA gather
                from stabstitch2_tpu.pipeline import compositor as _comp

                _comp.REPAIR_COUNT += 1
                import warnings

                warnings.warn(
                    "online composite window-gather overflow: batch "
                    "repaired exactly through the XLA gather path.",
                    RuntimeWarning)
                fetched = jax.device_get(
                    [self._enqueue_composite(his1, his2, m1, m2,
                                             pallas_gather=False,
                                             pallas_fused=False)])
            return fetched

        fetched = run()
        exts = np.stack([e for _, e, _ in fetched])
        ext = np.array([exts[:, 0].min(), exts[:, 1].max(),
                        exts[:, 2].min(), exts[:, 3].max()])
        if not self._ext_fits(ext):
            self._reanchor(m1, m2)
            fetched = run()
        return [self._pack(tuple(p[i] for p in planes))
                for planes, _, _ in fetched
                for i in range(planes[0].shape[0])]

    def _composite_one(self, hi1, hi2, mesh1, mesh2) -> np.ndarray:
        return self._composite_many(np.asarray(hi1)[None],
                                    np.asarray(hi2)[None],
                                    mesh1[None], mesh2[None])[0]

    def push(self, hi1: np.ndarray, hi2: np.ndarray) -> List[np.ndarray]:
        """Feed one synchronized frame pair. Returns the list of panorama
        frames that became available (possibly empty).

        Frames are uint8 BGR [H, W, 3] or packed I420 [H*3//2, W] (the
        format cameras/decoders produce natively; 1.5 bytes/px upload).
        Either way each frame crosses the host->device link exactly once —
        the composite reads the device-resident BGR copy."""
        s = self.s
        for name, h in (("hi1", hi1), ("hi2", hi2)):
            if h.ndim == 2:  # must actually be packable 4:2:0, not e.g. gray
                H15, W = h.shape
                if H15 % 3 or (H15 * 2 // 3) % 2 or W % 2:
                    raise ValueError(
                        f"{name} shape {h.shape} is not packed I420: need "
                        f"[H*3//2, W] with H and W even (got a 2-D frame "
                        f"that does not partition into Y+U+V planes); BGR "
                        f"frames must be [H, W, 3]")
            elif h.ndim != 3 or h.shape[-1] != 3:
                raise ValueError(
                    f"{name} shape {h.shape}: expected [H, W, 3] uint8 BGR "
                    f"or packed I420 [H*3//2, W]")
        hi_pair = jnp.stack([jnp.asarray(hi1, jnp.uint8),
                             jnp.asarray(hi2, jnp.uint8)])
        (self._prev_feat, self._prev_smesh1, self._prev_smesh2,
         self._buf_smesh1, self._buf_smesh2, self._buf_ts1, self._buf_ts2,
         sm1w, sm2w, hi_bgr) = self._step(
            s.spatial_vars, s.temporal_vars, s.smooth_vars, hi_pair,
            self._prev_feat, self._prev_smesh1, self._prev_smesh2,
            self._buf_smesh1, self._buf_smesh2, self._buf_ts1, self._buf_ts2,
            jnp.asarray(self._t == 0))

        # current window's smoothed meshes [WINDOW, GH+1, GW+1, 2] (model
        # res) — valid once the window is full; exposed for consumers that
        # want the stabilized geometry (metrics, custom compositors)
        self.window_smooth = (sm1w, sm2w)

        self._pending_hi.append((hi_bgr[0], hi_bgr[1]))
        self._t += 1
        if self._t < WINDOW:
            return []

        if self._t == WINDOW:  # first window: emit all 7 frames in one
            # burst (enqueued unsynced, fetched with one device_get)
            h1s = jnp.stack([h for h, _ in self._pending_hi])
            h2s = jnp.stack([h for _, h in self._pending_hi])
            outs = self._composite_many(h1s, h2s, sm1w, sm2w)
        else:                   # steady state: emit the window's last frame
            h1, h2 = self._pending_hi[-1]
            outs = self._composite_many(h1[None], h2[None],
                                        sm1w[-1:], sm2w[-1:])
        self._pending_hi = []
        return outs
