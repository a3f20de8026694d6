"""Multi-view (N >= 3) stitching as a chain of two-view solutions.

Parity target: Full_model_inference/Codes/test_online_tra_threeview.py —
the 2-view pipeline runs on each adjacent pair; at every junction the
shared view's two meshes are aligned by their mean offset (:353-360), the
junction's *middle plane* is their average (:363), and all meshes already
accumulated on each side are re-expressed in the middle plane with a TPS
point transform driven by the shared view's mesh change (:409-427).
Blending cascades left-to-right (:486-503). The reference hard-codes three
views; here the same junction rule iterates over an arbitrary chain.
"""

from __future__ import annotations

import functools
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.config import MODEL_H, MODEL_W
from stabstitch2_tpu.ops.blend import average_fusion, linear_fusion
from stabstitch2_tpu.ops.mesh import (
    denormalize_mesh,
    mesh_points,
    normalize_mesh,
    points_mesh,
    rigid_mesh,
)
from stabstitch2_tpu.ops.tps import (
    tps_params,
    tps_transform_points,
    tps_warp_with_mask,
)
from stabstitch2_tpu.pipeline.compositor import compute_canvas, scale_meshes
from stabstitch2_tpu.pipeline.smoothing import smooth_all_windows
from stabstitch2_tpu.pipeline.transport import stitched_meshes, transport_both_views


def pair_smooth_meshes(stitcher, lo_a, lo_b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phases 1-4 of the two-view pipeline -> (mesh_a, mesh_b) model-res."""
    mh, mw = stitcher.model_h, stitcher.model_w
    sm1, sm2 = stitcher._motion.spatial(lo_a, lo_b)
    tm1 = stitcher._motion.temporal(lo_a)
    tm2 = stitcher._motion.temporal(lo_b)
    ts1, ts2 = transport_both_views(tm1, sm1, tm2, sm2, mh, mw)
    smesh1 = stitched_meshes(sm1, mh, mw)
    smesh2 = stitched_meshes(sm2, mh, mw)
    smooth = smooth_all_windows(stitcher.smooth_net, stitcher.smooth_vars,
                                smesh1, smesh2, ts1, ts2,
                                window=stitcher.config.window)
    return smooth["smooth_mesh1"], smooth["smooth_mesh2"]


def _reproject(meshes: jnp.ndarray, source_mesh: jnp.ndarray,
               target_mesh: jnp.ndarray, oh: float, ow: float) -> jnp.ndarray:
    """Map per-frame meshes through the spline source->target (both [T,...])."""
    T = meshes.shape[0]
    gh, gw = meshes.shape[1] - 1, meshes.shape[2] - 1
    pts = mesh_points(normalize_mesh(meshes, oh, ow))
    src = mesh_points(normalize_mesh(source_mesh, oh, ow))
    tgt = mesh_points(normalize_mesh(target_mesh, oh, ow))
    Tc = tps_params(src, tgt)
    out = tps_transform_points(pts, src, tgt, T=Tc)
    return denormalize_mesh(points_mesh(out, grid_h=gh, grid_w=gw), oh, ow)


def chain_meshes(pair_meshes: List[Tuple[jnp.ndarray, jnp.ndarray]],
                 img_h: int, img_w: int, model_h: int = MODEL_H,
                 model_w: int = MODEL_W) -> List[jnp.ndarray]:
    """Compose adjacent-pair meshes into one global mesh per view.

    pair_meshes[j] = (mesh of view j, mesh of view j+1) from pair (j, j+1),
    model resolution. Returns hi-res meshes, one [T, GH+1, GW+1, 2] per view.
    """
    scaled = [(scale_meshes(a, img_h, img_w, model_h, model_w),
               scale_meshes(b, img_h, img_w, model_h, model_w))
              for a, b in pair_meshes]

    views = [scaled[0][0]]          # view 0 in pair-0's plane
    plane = scaled[0][1]            # shared view (1) in the current plane

    for j in range(1, len(scaled)):
        nxt_ref, nxt_tgt = scaled[j]
        # align the shared view across the two pairs by mean offset
        offset = jnp.mean(plane - nxt_ref, axis=(1, 2), keepdims=True)
        nxt_ref = nxt_ref + offset
        nxt_tgt = nxt_tgt + offset
        # normalization frame for the point transforms: the POST-alignment
        # canvas extents over every mesh known so far (threeview :353-395
        # computes them after the offset is applied; golden-pinned by
        # tests/goldens/threeview_parity.npz). The reference also re-bases
        # to the canvas origin, but the TPS affine term makes the point
        # transform translation-equivariant, so staying in original
        # coordinates changes nothing downstream.
        all_m = jnp.stack(views + [plane, nxt_ref, nxt_tgt])
        oh = float(all_m[..., 1].max() - all_m[..., 1].min())
        ow = float(all_m[..., 0].max() - all_m[..., 0].min())
        middle = (plane + nxt_ref) / 2.0
        # left side re-expressed through the shared view's change
        views = [_reproject(v, plane, middle, oh, ow) for v in views]
        views.append(middle)
        # right-side shared view for the next junction
        plane = _reproject(nxt_tgt, nxt_ref, middle, oh, ow)
    views.append(plane)
    return views


@functools.partial(jax.jit, static_argnames=("out_size", "warp_mode",
                                             "fusion_mode", "grid_span",
                                             "coord_stride"))
def _composite_chain_chunk(imgs, meshes, offset, out_size, warp_mode,
                           fusion_mode, grid_span, coord_stride: int = 1):
    """Warp+fuse one chunk of an N-view chain as ONE device program.

    imgs: [V, B, H, W, 3] uint8; meshes: [V, B, GH+1, GW+1, 2] hi-res.
    All V*B warps run as a single batched gather (the 2-view compositor's
    design, generalized); the cascade fusion loops over the STATIC view
    axis. Returns [B, oh, ow, 3] uint8."""
    V, B, H, W, _ = imgs.shape
    oh, ow = out_size
    span_h, span_w = grid_span or out_size
    im = imgs.reshape(V * B, H, W, 3).astype(jnp.float32)
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    src = mesh_points(normalize_mesh(
        meshes.reshape(V * B, *meshes.shape[2:]) - offset, span_h, span_w))
    tgt = jnp.broadcast_to(norm_rigid_pts[None], src.shape)
    # 3-channel gather + arithmetic coverage mask: warping a concatenated
    # ones-plane is identical math but a 4-channel gather hits a ~1000x
    # slower XLA lowering on TPU (CLAUDE.md)
    from stabstitch2_tpu.ops.pallas_warp import pallas_available

    warped, masks = tps_warp_with_mask(
        im, src, tgt, (oh, ow), mode=warp_mode,
        grid_span=(span_h, span_w),
        use_pallas=(pallas_available() if coord_stride == 1 else None),
        coord_stride=coord_stride)
    warped = warped.reshape(V, B, oh, ow, 3)
    masks = masks.reshape(V, B, oh, ow)
    # cascaded fusion left -> right (reference :486-503)
    acc, acc_mask = warped[0], masks[0]
    for k in range(1, V):
        if fusion_mode == "AVERAGE":
            acc = average_fusion(acc, warped[k])
        else:
            acc = jax.vmap(linear_fusion)(acc, warped[k], acc_mask, masks[k])
        acc_mask = acc_mask + masks[k] - acc_mask * masks[k]
    # clip+cast on device (average_fusion can overshoot when two warped
    # values nearly cancel — same formula as the reference,
    # test_online_ssd.py:142); uint8 also makes the download 4x smaller
    return jnp.clip(acc, 0.0, 255.0).astype(jnp.uint8)


def composite_chain(images: List[np.ndarray], meshes: List[jnp.ndarray],
                    config, chunk: int = 8) -> np.ndarray:
    """Warp every view to the global canvas and cascade the fusion."""
    T, H, W, _ = images[0].shape
    stacked = jnp.concatenate(meshes, axis=0)  # all views' frames
    canvas = compute_canvas(stacked, stacked, config.canvas_bucket)
    offset = jnp.asarray([canvas.x_min, canvas.y_min], jnp.float32)
    oh, ow = canvas.pad_h, canvas.pad_w

    # images stay on host; only one chunk x V views lives in HBM at a time
    host = [np.ascontiguousarray(img, np.uint8) for img in images]
    mesh_all = jnp.stack(meshes)
    outs = []
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        pad = chunk - (e - s)
        iv_np = np.stack([h[s:e] for h in host])
        if pad:  # keep one compiled program per canvas bucket
            iv_np = np.concatenate(
                [iv_np, np.repeat(iv_np[:, -1:], pad, axis=1)], axis=1)
        iv = jnp.asarray(iv_np)
        mv = mesh_all[:, s:e]
        if pad:
            mv = jnp.concatenate([mv, jnp.tile(mv[:, -1:],
                                               (1, pad, 1, 1, 1))], 1)
        # normalize by the TRUE canvas extents (grid_span), not the padded
        # bucket — TPS is only similarity-invariant, so the padded extent
        # must not leak in (same invariant as the 2-view compositor)
        fused = _composite_chain_chunk(
            iv, mv, offset, (oh, ow), config.warp_mode, config.fusion_mode,
            grid_span=(canvas.out_h, canvas.out_w),
            coord_stride=getattr(config, "coord_stride", 1))
        outs.append(np.asarray(
            fused[:e - s, :canvas.out_h, :canvas.out_w]))
    return np.concatenate(outs, 0)


def stitch_multi_view(stitcher, video_dir: str) -> np.ndarray:
    """Stitch video1..videoN subdirectories into one panoramic video."""
    from stabstitch2_tpu.data.video_io import load_view

    views = sorted(d for d in os.listdir(video_dir)
                   if d.startswith("video")
                   and os.path.isdir(os.path.join(video_dir, d)))
    assert len(views) >= 2, f"need >=2 views, found {views}"
    his, los = [], []
    for v in views:
        hi, lo = load_view(video_dir, v, (stitcher.model_h, stitcher.model_w))
        his.append(hi)
        los.append(lo)
    T = min(len(h) for h in his)
    his = [h[:T] for h in his]
    los = [jnp.asarray(l[:T]) for l in los]

    pair_meshes = [pair_smooth_meshes(stitcher, los[j], los[j + 1])
                   for j in range(len(views) - 1)]
    H, W = his[0].shape[1:3]
    meshes = chain_meshes(pair_meshes, H, W, stitcher.model_h,
                          stitcher.model_w)
    return composite_chain(his, meshes, stitcher.config, chunk=stitcher.chunk)
