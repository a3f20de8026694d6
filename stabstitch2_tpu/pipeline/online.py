"""True streaming (online) stitcher: push frame pairs, emit panoramas.

The reference is *algorithmically* online (sliding 7-frame window,
test_online_ssd.py:359-392) but its driver is offline — it loads the whole
video, and even sizes the output canvas from ALL frames' meshes
(test_online_ssd.py:106-120, non-causal). This module provides the real
streaming deployment mode:

- per-frame jitted steps (spatial pair, temporal features with a cached
  previous-frame feature like temporal_network.py:129-146, transport,
  single-window smooth, single-frame composite);
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

    def __init__(self, stitcher, canvas_margin: float = 1.25):
        self.s = stitcher
        self.canvas_margin = canvas_margin
        self.cfg: StitchConfig = stitcher.config
        mh, mw = stitcher.model_h, stitcher.model_w
        self.mh, self.mw = mh, mw

        net_s, net_t, net_m = (stitcher.spatial_net, stitcher.temporal_net,
                               stitcher.smooth_net)

        @jax.jit
        def _prep(hi_u8):
            x = hi_u8.astype(jnp.float32)
            if hi_u8.shape[1] != mh or hi_u8.shape[2] != mw:
                x = jax.image.resize(x, (x.shape[0], mh, mw, 3), "bilinear")
            return x / 127.5 - 1.0

        @jax.jit
        def _spatial(vars_, f1, f2):
            off, mref, mtgt = net_s.apply(vars_, f1, f2, False)
            out = spatial_motions(off, mref, mtgt, mh, mw)
            return out["motion1"][0], out["motion2"][0]

        @jax.jit
        def _features(vars_, f):
            return net_t.apply(vars_, f, False, method=_TN.features)

        @jax.jit
        def _tmotion(vars_, fp, fn):
            return net_t.apply(vars_, fp, fn,
                               method=_TN.motion_from_features)[0]

        rigid = rigid_mesh(mh, mw)
        norm_rigid_pts = mesh_points(normalize_mesh(rigid, mh, mw))

        @jax.jit
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
        def _smooth(vars_, smesh1, smesh2, ts1, ts2):
            raw = net_m.apply(vars_, smesh1[None], smesh2[None], ts1[None],
                              ts2[None])
            d = smooth_outputs(raw)
            return d["smooth_mesh1"][0], d["smooth_mesh2"][0]

        self._prep = _prep
        self._spatial = _spatial
        self._features = _features
        self._tmotion = _tmotion
        self._transport = _transport
        self._smooth = _smooth

        self._rigid = rigid
        self.reset()

    def reset(self):
        self._t = 0
        self._prev_feat = None
        self._prev_smesh1 = None
        self._prev_smesh2 = None
        self._smesh1: List = []
        self._smesh2: List = []
        self._ts1: List = []
        self._ts2: List = []
        self._pending_hi: List = []
        self.canvas: Optional[Canvas] = None
        self._offset = None
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
        pad_w = -(-out_w // bucket) * bucket
        pad_h = -(-out_h // bucket) * bucket
        self.canvas = Canvas(out_h=out_h, out_w=out_w, pad_h=pad_h,
                             pad_w=pad_w, x_min=float(cx - half_w),
                             y_min=float(cy - half_h))
        self._offset = jnp.asarray([self.canvas.x_min, self.canvas.y_min],
                                   jnp.float32)

    def _fits(self, m1, m2) -> bool:
        c = self.canvas
        m = np.asarray(jnp.stack([m1, m2]))
        return bool(m[..., 0].min() >= c.x_min
                    and m[..., 0].max() <= c.x_min + c.out_w
                    and m[..., 1].min() >= c.y_min
                    and m[..., 1].max() <= c.y_min + c.out_h)

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

    def _composite_one(self, hi1, hi2, mesh1, mesh2):
        H, W = hi1.shape[0], hi1.shape[1]
        m1 = scale_meshes(mesh1[None], H, W, self.mh, self.mw)
        m2 = scale_meshes(mesh2[None], H, W, self.mh, self.mw)
        if self.canvas is None:
            self._establish_canvas(m1, m2, H, W)
        elif not self._fits(m1, m2):
            self._reanchor(m1, m2)
        fused = _composite_chunk(
            jnp.asarray(hi1)[None], jnp.asarray(hi2)[None], m1, m2,
            self._offset, (self.canvas.pad_h, self.canvas.pad_w),
            self.cfg.warp_mode, self.cfg.fusion_mode,
            grid_span=(self.canvas.out_h, self.canvas.out_w))
        return np.asarray(fused[0, :self.canvas.out_h, :self.canvas.out_w])

    def push(self, hi1: np.ndarray, hi2: np.ndarray) -> List[np.ndarray]:
        """Feed one synchronized frame pair (uint8 HWC). Returns the list of
        panorama frames that became available (possibly empty)."""
        s = self.s
        lo = self._prep(jnp.stack([jnp.asarray(hi1, jnp.uint8),
                                   jnp.asarray(hi2, jnp.uint8)]))
        f1, f2 = lo[0:1], lo[1:2]

        sm1, sm2 = self._spatial(s.spatial_vars, f1, f2)
        smesh1 = self._rigid + sm1
        smesh2 = self._rigid + sm2

        feat = self._features(s.temporal_vars, lo)
        if self._prev_feat is None:
            ts1 = jnp.zeros_like(smesh1)
            ts2 = jnp.zeros_like(smesh2)
        else:
            tm1 = self._tmotion(s.temporal_vars, self._prev_feat[0:1],
                                feat[0:1])
            tm2 = self._tmotion(s.temporal_vars, self._prev_feat[1:2],
                                feat[1:2])
            ts1 = self._transport(tm1, self._prev_smesh1, smesh1)
            ts2 = self._transport(tm2, self._prev_smesh2, smesh2)
        self._prev_feat = feat
        self._prev_smesh1 = smesh1
        self._prev_smesh2 = smesh2

        self._smesh1.append(smesh1)
        self._smesh2.append(smesh2)
        self._ts1.append(ts1)
        self._ts2.append(ts2)
        self._pending_hi.append((hi1, hi2))
        if len(self._smesh1) > WINDOW:
            for buf in (self._smesh1, self._smesh2, self._ts1, self._ts2):
                buf.pop(0)

        self._t += 1
        if len(self._smesh1) < WINDOW:
            return []

        # window full: smooth (first element's trajectory zeroed per window)
        ts1w = jnp.stack(self._ts1).at[0].set(0.0)
        ts2w = jnp.stack(self._ts2).at[0].set(0.0)
        sm1w, sm2w = self._smooth(s.smooth_vars, jnp.stack(self._smesh1),
                                  jnp.stack(self._smesh2), ts1w, ts2w)

        outs = []
        if self._t == WINDOW:  # first window: emit all 7 frames
            for k in range(WINDOW):
                h1, h2 = self._pending_hi[k]
                outs.append(self._composite_one(h1, h2, sm1w[k], sm2w[k]))
            self._pending_hi = []
        else:                   # steady state: emit the window's last frame
            h1, h2 = self._pending_hi[-1]
            outs.append(self._composite_one(h1, h2, sm1w[-1], sm2w[-1]))
            self._pending_hi = []
        return outs
