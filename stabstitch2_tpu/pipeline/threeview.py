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
from typing import List, Optional, Tuple

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


def pair_smooth_meshes(stitcher, lo_a, lo_b, n_frames=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phases 1-4 of the two-view pipeline -> (mesh_a, mesh_b) model-res.

    Routes through the stitch path's fused transport+smooth program with
    16-frame length bucketing (VideoStitcher.motion_smooth) — one compiled
    program set shared with two-view stitching, no per-length recompiles.
    ``n_frames``: the TRUE frame count when lo_* carry dp padding — the
    returned meshes are cropped to it (padded frames have their own
    smoothed trajectories, which must not leak into the junction-extent
    algebra in chain_meshes).
    """
    smooth = stitcher.motion_smooth(lo_a, lo_b, n_frames=n_frames)
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
                                             "fusion_mode", "out_format",
                                             "coord_stride",
                                             "pallas_gather", "pallas_fused",
                                             "shard_mesh"))
def _composite_chain_chunk(imgs, meshes, offset, out_size, warp_mode,
                           fusion_mode, grid_span, out_format: str = "bgr",
                           coord_stride: int = 1,
                           pallas_gather: bool = False,
                           pallas_fused: bool = False,
                           shard_mesh=None):
    """Warp+fuse one chunk of an N-view chain as ONE device program.

    imgs: [V, B, H, W, 3] uint8; meshes: [V, B, GH+1, GW+1, 2] hi-res.
    All V*B warps run as a single batched gather (the 2-view compositor's
    design, generalized); the cascade fusion loops over the STATIC view
    axis. Returns [B, oh, ow, 3] uint8 for out_format='bgr', or uint8
    I420 planes (Y, U, V) for 'yuv420' — 1.5 bytes/px on the dominant
    device->host leg, same as the 2-view compositor. ``shard_mesh``
    (static): the active GSPMD mesh under dp inference — the Pallas
    coords + window-gather kernels are shard_mapped over the V*B batch
    axis instead of feeding a bare pallas_call sharded inputs; a batch
    that does not divide the data axis falls back to XLA."""
    V, B, H, W, _ = imgs.shape
    oh, ow = out_size
    span_h, span_w = grid_span or out_size
    im = imgs.reshape(V * B, H, W, 3)
    if not (im.dtype == jnp.uint8 and warp_mode == "NORMAL"):
        # uint8 NORMAL inputs ride the single packed-patch gather inside
        # tps_warp_with_mask (BENCHMARKS round-3b); everything else warps
        # in f32 like before
        im = im.astype(jnp.float32)
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    src = mesh_points(normalize_mesh(
        meshes.reshape(V * B, *meshes.shape[2:]) - offset, span_h, span_w))
    tgt = jnp.broadcast_to(norm_rigid_pts[None], src.shape)
    # 3-channel gather + arithmetic coverage mask: gathers are
    # per-lookup-bound on TPU, so never warp extra channels
    # (BENCHMARKS.md round-3b)
    from stabstitch2_tpu.ops.pallas_warp import pallas_available

    warped, masks, viol = tps_warp_with_mask(
        im, src, tgt, (oh, ow), mode=warp_mode,
        grid_span=(span_h, span_w),
        use_pallas=(pallas_available() if coord_stride == 1 else None),
        coord_stride=coord_stride,
        use_pallas_gather=pallas_gather, use_pallas_fused=pallas_fused,
        return_viol=True, shard_mesh=shard_mesh)
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
    fused = jnp.clip(acc, 0.0, 255.0)
    if out_format == "yuv420":
        from stabstitch2_tpu.ops.yuv import bgr_to_yuv420

        return bgr_to_yuv420(fused), viol
    return fused.astype(jnp.uint8), viol


def composite_chain_begin(images, meshes: List[jnp.ndarray], config,
                          chunk: int = 8,
                          pallas_gather: Optional[bool] = None,
                          pallas_fused: Optional[bool] = None,
                          shard_mesh=None,
                          n_frames: Optional[int] = None):
    """Enqueue the whole N-view composite; d2h copies requested async.

    images: list of V [T, H, W, 3] uint8 arrays — device arrays (the fast
    path: frames crossed the link once at upload) or host numpy (uploaded
    per chunk so only chunk x V images live in HBM at a time). Returns an
    opaque state for :func:`composite_chain_finish` — chunk k's download
    drains while chunk k+1 computes, and callers stitching a dataset can
    begin the next video before finishing this one (the 2-view
    begin/finish design, cli.cmd_stitch). ``shard_mesh``: the stitcher's
    dp mesh, threaded into the chunk program so the Pallas kernels are
    shard_mapped over the batch axis instead of a bare pallas_call
    receiving GSPMD-sharded inputs (round-4 advisor finding).
    ``n_frames``: the TRUE frame count when ``images`` carry dp padding
    (stitcher._put_frames repeats the last frame up to the data axis);
    the finish crops back to it.
    """
    T, H, W = images[0].shape[0], images[0].shape[1], images[0].shape[2]
    if n_frames is None:
        n_frames = T
    import jax

    if pallas_fused is None:
        pallas_fused = getattr(config, "pallas_fused", None)
    if pallas_fused is None:
        # Auto: same policy as compositor.composite_begin — the ONE-
        # program fused warp kernel on TPU (exact-or-zero + repaired at
        # finish), the XLA packed-patch gather elsewhere (round 5).
        pallas_fused = (config.warp_mode == "NORMAL"
                        and getattr(config, "coord_stride", 1) == 1
                        and jax.default_backend() == "tpu")
    if pallas_gather is None:
        pallas_gather = getattr(config, "pallas_gather", None)
    if pallas_gather is None:
        # v2 window-gather: auto only when the fused kernel is off
        pallas_gather = (not pallas_fused
                         and config.warp_mode == "NORMAL"
                         and jax.default_backend() == "tpu")
    out_format = getattr(config, "download_format", "bgr")
    stacked = jnp.concatenate(meshes, axis=0)  # all views' frames
    canvas = compute_canvas(stacked, stacked, config.canvas_bucket)
    # even output dims for 4:2:0 (mp4 encoders require them anyway)
    oh = canvas.out_h if out_format == "bgr" else canvas.out_h // 2 * 2
    ow = canvas.out_w if out_format == "bgr" else canvas.out_w // 2 * 2
    # traced span: one compiled composite program per padded bucket across
    # every true canvas extent (see compositor._composite_chunk)
    grid_span = (jnp.float32(canvas.out_h), jnp.float32(canvas.out_w))
    if (oh, ow) != (canvas.out_h, canvas.out_w):
        import dataclasses as _dc

        canvas = _dc.replace(canvas, out_h=oh, out_w=ow)
    if canvas.pad_h > config.max_canvas_h or canvas.pad_w > config.max_canvas_w:
        raise ValueError(
            f"canvas {canvas.pad_h}x{canvas.pad_w} exceeds configured max "
            f"{config.max_canvas_h}x{config.max_canvas_w}")
    offset = jnp.asarray([canvas.x_min, canvas.y_min], jnp.float32)
    # 32-quantized device crops; exact crop on host at finish (shared
    # rationale with composite_begin)
    ohq = min(-(-oh // 32) * 32, canvas.pad_h)
    owq = min(-(-ow // 32) * 32, canvas.pad_w)

    host = [np.ascontiguousarray(img, np.uint8)
            if isinstance(img, np.ndarray) else img for img in images]
    mesh_all = jnp.stack(meshes)
    pending = []
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        pad = chunk - (e - s)
        if isinstance(host[0], np.ndarray):
            # host frames: ONE stacked upload per chunk (only chunk x V
            # images live in HBM at a time)
            iv_np = np.stack([h[s:e] for h in host])
            if pad:  # keep one compiled program per canvas bucket
                iv_np = np.concatenate(
                    [iv_np, np.repeat(iv_np[:, -1:], pad, axis=1)], axis=1)
            iv = jnp.asarray(iv_np)
        else:
            # device frames: pure slicing, no host round trip
            pieces = [h[s:e] for h in host]
            if pad:
                pieces = [jnp.concatenate(
                    [p, jnp.tile(p[-1:], (pad, 1, 1, 1))], 0)
                    for p in pieces]
            iv = jnp.stack(pieces)
        mv = mesh_all[:, s:e]
        if pad:
            mv = jnp.concatenate([mv, jnp.tile(mv[:, -1:],
                                               (1, pad, 1, 1, 1))], 1)
        # normalize by the TRUE canvas extents (grid_span), not the padded
        # bucket — TPS is only similarity-invariant, so the padded extent
        # must not leak in (same invariant as the 2-view compositor)
        # chained yuv420 on the v2 window-gather path only: the fused
        # kernel's in-program yuv is faster than the chain (round 5)
        chain_yuv = (pallas_gather and not pallas_fused
                     and out_format == "yuv420")

        def run(iv=iv, mv=mv, n=e - s, pg=pallas_gather, pf=pallas_fused):
            chunk_fmt = "bgr" if chain_yuv else out_format
            fused, viol = _composite_chain_chunk(
                iv, mv, offset, (canvas.pad_h, canvas.pad_w),
                config.warp_mode, config.fusion_mode, grid_span=grid_span,
                out_format=chunk_fmt,
                coord_stride=getattr(config, "coord_stride", 1),
                pallas_gather=pg, pallas_fused=pf, shard_mesh=shard_mesh)
            if chain_yuv:
                from stabstitch2_tpu.ops.yuv import bgr_u8_to_yuv420_jit

                fused = bgr_u8_to_yuv420_jit(fused)
            if out_format == "yuv420":
                yp, up, vp = fused
                cropped = (yp[:n, :ohq, :owq],
                           up[:n, :ohq // 2, :owq // 2],
                           vp[:n, :ohq // 2, :owq // 2])
            else:
                cropped = (fused[:n, :ohq, :owq],)
            return cropped, viol

        cropped, viol = run()
        for c in cropped:  # request d2h NOW: chunk k drains under k+1
            try:
                c.copy_to_host_async()
            except AttributeError:
                pass
        # repair closure: retains this chunk's device inputs only while
        # the window-gather kernel (whose rare overflows it repairs) is on
        repair = ((lambda r=run: r(pg=False, pf=False)[0])
                  if (pallas_gather or pallas_fused) else None)
        pending.append((cropped, viol, repair))
    return pending, canvas, out_format, n_frames


def composite_chain_finish(state) -> Tuple[np.ndarray, str]:
    """Collect frames from :func:`composite_chain_begin`.

    Returns (frames, frame_format): uint8 BGR [T,oh,ow,3] for 'bgr', or
    packed I420 [T, oh*3//2, ow] for 'i420' — cropped to the TRUE frame
    count when the begin ran on dp-padded uploads."""
    pending, canvas, out_format, n_frames = state
    oh, ow = canvas.out_h, canvas.out_w
    outs_and_viol = jax.device_get([(c, v) for c, v, _ in pending])
    outs = [o for o, _ in outs_and_viol]
    bad = [i for i, (_, v) in enumerate(outs_and_viol) if bool(v)]
    if bad:
        # exact repair through the XLA gather, same contract (and shared
        # telemetry counter) as compositor.composite_finish
        from stabstitch2_tpu.pipeline import compositor as _comp

        _comp.REPAIR_COUNT += len(bad)
        for i in bad:
            outs[i] = jax.device_get(pending[i][2]())
        import warnings

        warnings.warn(
            f"composite window-gather overflow on {len(bad)} chunk(s) "
            "(extreme local TPS compression): repaired exactly through "
            "the XLA gather path.", RuntimeWarning)
    # exact crop on host (device crops are 32-quantized)
    if out_format == "yuv420":
        from stabstitch2_tpu.data.video_io import pack_i420_host

        return (np.concatenate(
            [pack_i420_host(y[:, :oh, :ow], u[:, :oh // 2, :ow // 2],
                            v[:, :oh // 2, :ow // 2]) for y, u, v in outs],
            axis=0)[:n_frames], "i420")
    return (np.concatenate([o[0][:, :oh, :ow] for o in outs],
                           axis=0)[:n_frames], "bgr")


def composite_chain(images: List[np.ndarray], meshes: List[jnp.ndarray],
                    config, chunk: int = 8) -> np.ndarray:
    """Warp every view to the global canvas and cascade the fusion."""
    frames, _ = composite_chain_finish(
        composite_chain_begin(images, meshes, config, chunk=chunk))
    return frames


def stitch_multi_begin(stitcher, his: List[np.ndarray]):
    """Enqueue an N-view video's full pipeline; return pending state.

    his: list of V host arrays — uint8 BGR [T,H,W,3] or packed I420
    [T, H*3//2, W] (1.5 bytes/px, the thinnest upload). Each view crosses
    the host->device link ONCE as uint8; the model-resolution stream is
    derived on device (resize+normalize), exactly like the 2-view
    stitch_begin — the reference's three-view driver re-reads and
    re-uploads both streams (test_online_tra_threeview.py:154-210).
    """
    mh, mw = stitcher.model_h, stitcher.model_w
    T = min(h.shape[0] for h in his)
    dev, los = [], []
    for h in his:
        d = stitcher._put_frames(h[:T])
        if d.ndim == 3:  # packed I420 -> uint8 BGR on device
            d = stitcher._unpack_i420(d)
        dev.append(d)
        los.append(stitcher._preprocess(d, mh, mw))
    # n_frames=T crops the smooth meshes to the TRUE count: under dp the
    # uploads are padded (repeat-last) and the padded frames have their
    # own smoothed trajectories, which must not leak into chain_meshes'
    # junction-extent normalization (measured: up to 228-uint8 composite
    # deltas at T=11 on the 8-device mesh without the crop).
    pair_meshes = [pair_smooth_meshes(stitcher, los[j], los[j + 1],
                                      n_frames=T)
                   for j in range(len(dev) - 1)]
    H, W = int(dev[0].shape[1]), int(dev[0].shape[2])
    # chain_meshes pulls mesh extents to host (canvas sizing needs static
    # shapes) — the one sync point, on tiny arrays. Under a dp mesh the
    # pair meshes are GSPMD-sharded; pull them to host FIRST (~5 KB each)
    # so the chain's eager junction algebra never runs eager ops on
    # sharded arrays — XLA:CPU aborts nondeterministically on that
    # pattern (round-5; same hazard class as the round-3 eager-pad fix),
    # and the chain syncs per junction anyway.
    if stitcher.mesh is not None:
        pair_meshes = [(np.asarray(a), np.asarray(b))
                       for a, b in pair_meshes]
    meshes = chain_meshes(pair_meshes, H, W, mh, mw)
    Tp = int(dev[0].shape[0])
    if Tp != T:
        # dp-padded uploads: pad the chained meshes back to the upload
        # length with repeat-last (padded frames are cropped from the
        # output; any mesh value there is fine and repeat-last keeps the
        # canvas extents unchanged)
        meshes = [jnp.concatenate(
            [m, jnp.tile(m[-1:], (Tp - T,) + (1,) * (m.ndim - 1))], 0)
            for m in meshes]
    # thread the stitcher's dp mesh: under GSPMD the chunk program
    # shard_maps the Pallas kernels over the batch axis (a bare
    # pallas_call cannot auto-partition — round-4 advisor finding).
    # n_frames=T: _put_frames may have dp-padded the uploads; the finish
    # crops back to the true count (same contract as stitch_begin)
    return composite_chain_begin(dev, meshes, stitcher.config,
                                 chunk=stitcher.chunk,
                                 shard_mesh=stitcher.mesh, n_frames=T)


def stitch_multi_finish(state) -> Tuple[np.ndarray, str]:
    """Collect (frames, frame_format) from :func:`stitch_multi_begin`."""
    return composite_chain_finish(state)


def stitch_multi_view(stitcher, video_dir: str) -> np.ndarray:
    """Stitch video1..videoN subdirectories into one panoramic video.

    Returns uint8 BGR frames (or packed I420 when
    config.download_format == 'yuv420').
    """
    from stabstitch2_tpu.data.video_io import load_view

    views = sorted(d for d in os.listdir(video_dir)
                   if d.startswith("video")
                   and os.path.isdir(os.path.join(video_dir, d)))
    assert len(views) >= 2, f"need >=2 views, found {views}"
    his = [load_view(video_dir, v, (stitcher.model_h, stitcher.model_w),
                     want_hi=True)[0] for v in views]
    frames, _ = stitch_multi_finish(stitch_multi_begin(stitcher, his))
    return frames
