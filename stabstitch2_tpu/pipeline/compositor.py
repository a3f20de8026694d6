"""Panorama compositor: global canvas + hi-res TPS warps + fusion.

Parity target: ``get_stable_sqe`` (Full_model_inference/Codes/test_online_ssd.py:96-154):
meshes (at 360x480 model scale) are rescaled to the input resolution, a
video-global canvas is sized from the min/max mesh extents (constant output
size per video), every frame's two views are TPS-warped onto the canvas and
fused (AVERAGE or LINEAR).

TPU-first design:
- the canvas extent is data-dependent -> computed from the (tiny) meshes,
  pulled to host once per video, and padded up to a static bucket so the
  big warp kernel compiles once per bucket, not per video;
- frames are warped in chunks of [2*chunk] images (both views batched,
  like the reference's bs=2 concat but across many frames at once);
- fusion happens on-device; only final uint8 panoramas return to host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.config import MODEL_H, MODEL_W, StitchConfig
from stabstitch2_tpu.ops.blend import average_fusion, linear_fusion
from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.ops.tps import tps_params


@dataclasses.dataclass(frozen=True)
class Canvas:
    """Static (bucketed) canvas geometry for one video."""

    out_h: int          # true canvas size (before bucketing)
    out_w: int
    pad_h: int          # bucketed size used for jit shapes
    pad_w: int
    x_min: float
    y_min: float


def scale_meshes(mesh: jnp.ndarray, img_h: int, img_w: int,
                 model_h: int = MODEL_H, model_w: int = MODEL_W) -> jnp.ndarray:
    """Rescale model-resolution meshes to the true frame resolution."""
    sx = img_w / float(model_w)
    sy = img_h / float(model_h)
    return mesh * jnp.asarray([sx, sy], mesh.dtype)


def compute_canvas(mesh1: jnp.ndarray, mesh2: jnp.ndarray,
                   bucket: int = 128) -> Canvas:
    """Canvas from global mesh extents. mesh1/2: [T, GH+1, GW+1, 2] hi-res px.

    Host-side (tiny arrays): the dynamic extent becomes static jit shapes via
    bucketing.
    """
    m = np.asarray(jnp.stack([mesh1, mesh2]))
    x_min, x_max = float(m[..., 0].min()), float(m[..., 0].max())
    y_min, y_max = float(m[..., 1].min()), float(m[..., 1].max())
    out_w = max(int(np.ceil(x_max - x_min)), 8)
    out_h = max(int(np.ceil(y_max - y_min)), 8)
    pad_w = int(np.ceil(out_w / bucket)) * bucket
    pad_h = int(np.ceil(out_h / bucket)) * bucket
    return Canvas(out_h=out_h, out_w=out_w, pad_h=pad_h, pad_w=pad_w,
                  x_min=x_min, y_min=y_min)


@functools.partial(jax.jit, static_argnames=("out_size", "warp_mode",
                                             "fusion_mode", "out_format",
                                             "coord_stride",
                                             "pallas_gather", "pallas_fused",
                                             "shard_mesh"))
def _composite_chunk(img1, img2, mesh1, mesh2, offset, out_size,
                     warp_mode: str, fusion_mode: str,
                     grid_span=None, out_format: str = "bgr",
                     coord_stride: int = 1,
                     pallas_gather: bool = False,
                     pallas_fused: bool = False,
                     shard_mesh=None):
    """Warp+fuse a chunk of frames.

    img1/img2: [B, H, W, 3] uint8 (or float 0..255); mesh1/mesh2:
    [B, GH+1, GW+1, 2] hi-res pixel meshes; offset: [2] (x_min, y_min).
    ``grid_span`` (true canvas extents) is a TRACED operand, not a static
    arg: the composite warp is the framework's most expensive compile, and
    every video has a different true extent — traced, one program per
    padded bucket serves the whole dataset.
    Returns [B, oh, ow, 3] uint8 for out_format='bgr', or uint8 I420 planes
    (Y [B,oh,ow], U, V [B,oh/2,ow/2]) for 'yuv420' — the device->host link
    is the bottleneck, so the output leaves the chip as thin as possible
    (uint8, and 1.5 bytes/px in the encoder-native 4:2:0 layout).
    ``shard_mesh`` (static): the active GSPMD mesh under dp inference —
    the Pallas coords + window-gather kernels are shard_mapped over the
    batch axis instead of feeding a bare pallas_call sharded inputs; a
    batch that does not divide the data axis falls back to XLA.
    """
    input_u8 = img1.dtype == jnp.uint8 and img2.dtype == jnp.uint8
    if not input_u8:
        img1 = img1.astype(jnp.float32)
        img2 = img2.astype(jnp.float32)
    B, H, W, _ = img1.shape
    oh, ow = out_size
    # normalize by the TRUE canvas (grid_span) like the reference
    # (get_stable_sqe normalizes by out_height/out_width); TPS is only
    # similarity-invariant, so the padded extent must not leak in
    span_h, span_w = grid_span or out_size
    translated1 = mesh1 - offset
    translated2 = mesh2 - offset
    norm1 = mesh_points(normalize_mesh(translated1, span_h, span_w))
    norm2 = mesh_points(normalize_mesh(translated2, span_h, span_w))
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    norm_rigid = mesh_points(normalize_mesh(rigid, H, W))[None]
    norm_rigid = jnp.broadcast_to(norm_rigid, norm1.shape)

    stack = jnp.concatenate([img1, img2], axis=0)
    source = jnp.concatenate([norm1, norm2], axis=0)
    target = jnp.concatenate([norm_rigid, norm_rigid], axis=0)
    from stabstitch2_tpu.ops.interp import (
        bilinear_mask,
        bilinear_sample,
        bilinear_sample_patch_u8,
        grid_sample_align_corners,
        grid_sample_mask_align_corners,
    )
    from stabstitch2_tpu.ops.pallas_warp import pallas_available
    from stabstitch2_tpu.ops.tps import tps_sample_coords

    # The coverage mask is derived arithmetically (ops/interp.py:
    # bilinear_mask), never by warping a concatenated ones-plane like the
    # reference: the mask equals the bilinear weight sum, and every
    # gathered channel costs real lookup time on TPU (gathers are
    # per-lookup-bound; BENCHMARKS.md round-3b).
    T = tps_params(source, target)
    viol = jnp.zeros((), jnp.bool_)
    if shard_mesh is not None and (2 * B) % shard_mesh.shape.get(
            "data", 1) != 0:
        # shard_map needs an exact batch split (stack batch is 2B)
        pallas_gather = False
        pallas_fused = False
    if (pallas_fused and warp_mode == "NORMAL" and input_u8
            and coord_stride == 1):
        # ONE-program composite warp (round 5): TPS eval + window gather
        # + weighted combine in a single Mosaic kernel
        # (ops/pallas_fused.py). Same exact-or-zero + repair contract as
        # the v2 window gather; <= 1 uint8 LSB vs the XLA path from FMA
        # contraction (PARITY.md).
        from stabstitch2_tpu.ops.pallas_fused import fused_warp_planes

        pb, pg, pr, m2d, viol = fused_warp_planes(
            stack, T, source, (oh, ow), grid_span=(span_h, span_w),
            shard_mesh=shard_mesh)
        warped = jnp.stack([pb, pg, pr], axis=-1)    # [2B, oh, ow, 3]
        masks = m2d
        w1, w2 = warped[:B], warped[B:]
        if fusion_mode == "AVERAGE":
            fused = average_fusion(w1, w2)
        else:
            fused = jax.vmap(linear_fusion)(w1, w2, masks[:B], masks[B:])
        fused = jnp.clip(fused, 0.0, 255.0)
        if out_format == "yuv420":
            from stabstitch2_tpu.ops.yuv import bgr_to_yuv420

            return bgr_to_yuv420(fused), viol
        return fused.astype(jnp.uint8), viol
    # coord_stride > 1 takes the coarse-lattice path; the fused Pallas
    # kernel is the full-resolution alternative (only one applies)
    x_s, y_s = tps_sample_coords(T, source, (oh, ow),
                                 use_pallas=(pallas_available()
                                             if coord_stride == 1 else None),
                                 grid_span=(span_h, span_w),
                                 coord_stride=coord_stride,
                                 shard_mesh=shard_mesh)
    if warp_mode == "NORMAL":
        if input_u8 and pallas_gather and out_format in ("yuv420",
                                                         "planes_u8"):
            # PLANAR route (round 5): the window-gather kernel's combine
            # emits per-channel planes and the whole tail (fusion,
            # quantize, 4:2:0) stays planar — interleaved-uint8 channel
            # extraction is the dominant cost of the old chained yuv
            # program on TPU. Output bytes are identical to the chained
            # bgr-u8 + yuv pair (quantize-then-convert, same arithmetic).
            from stabstitch2_tpu.ops.pallas_gather import (
                bilinear_sample_patch_u8_pallas)

            pb, pg, pr, viol = bilinear_sample_patch_u8_pallas(
                stack, x_s, y_s, out_size, combine_layout="planes",
                shard_mesh=shard_mesh)
            m = bilinear_mask(H, W, x_s, y_s)
            masks = m.reshape(2 * B, oh, ow)
            if fusion_mode == "AVERAGE":
                fused_pl = tuple(average_fusion(p[:B], p[B:])
                                 for p in (pb, pg, pr))
            else:
                # linear_fusion's math, planar: one seam mask per frame
                # from the coverage masks, then per-channel blends
                from stabstitch2_tpu.ops.blend import linear_blend_mask

                mask1 = jax.vmap(linear_blend_mask)(masks[:B], masks[B:])
                mask2 = (1.0 - mask1) * masks[B:]
                fused_pl = tuple(p[:B] * mask1 + p[B:] * mask2
                                 for p in (pb, pg, pr))
            fused_pl = tuple(jnp.clip(p, 0.0, 255.0) for p in fused_pl)
            if out_format == "yuv420":
                from stabstitch2_tpu.ops.yuv import bgr_planes_to_yuv420

                return bgr_planes_to_yuv420(*fused_pl), viol
            return tuple(jnp.clip(jnp.round(p), 0.0, 255.0
                                  ).astype(jnp.uint8)
                         for p in fused_pl), viol
        if input_u8 and pallas_gather:
            # VMEM window-gather Mosaic kernel: 10.7x over the XLA HBM
            # gather at production shapes (ops/pallas_gather.py; round-4
            # chip probe). `viol` flags window-invariant breaches
            # (extreme local TPS compression — clamped gracefully,
            # surfaced by composite_finish as a warning).
            from stabstitch2_tpu.ops.pallas_gather import (
                bilinear_sample_patch_u8_pallas)

            sampled, viol = bilinear_sample_patch_u8_pallas(
                stack, x_s, y_s, out_size,
                combine_layout="flat",
                shard_mesh=shard_mesh)
        elif input_u8:
            # ONE packed-patch gather instead of 4 corner gathers — the
            # gather is the compositor's dominant device cost (measured
            # ~94 -> ~25 ms per chunk; ops/interp.py docstring). Exact
            # for every finite coordinate; NaN coords (degenerate
            # meshes) come out 0 instead of NaN.
            sampled = bilinear_sample_patch_u8(stack, x_s, y_s)
        else:
            sampled = bilinear_sample(stack.astype(jnp.float32), x_s, y_s)
        m = bilinear_mask(H, W, x_s, y_s)
    elif warp_mode == "FAST":
        sampled = grid_sample_align_corners(stack.astype(jnp.float32),
                                            x_s, y_s)
        m = grid_sample_mask_align_corners(H, W, x_s, y_s)
    else:
        raise ValueError(f"unknown warp mode {warp_mode!r}")
    warped = sampled.reshape(2 * B, oh, ow, 3)
    masks = m.reshape(2 * B, oh, ow)
    w1, w2 = warped[:B], warped[B:]

    if fusion_mode == "AVERAGE":
        fused = average_fusion(w1, w2)
    else:
        fused = jax.vmap(linear_fusion)(w1, w2, masks[:B], masks[B:])
    fused = jnp.clip(fused, 0.0, 255.0)
    if out_format == "yuv420":
        from stabstitch2_tpu.ops.yuv import bgr_to_yuv420

        return bgr_to_yuv420(fused), viol
    return fused.astype(jnp.uint8), viol


def composite_begin(img1: np.ndarray, img2: np.ndarray,
                    smooth_mesh1: jnp.ndarray, smooth_mesh2: jnp.ndarray,
                    config: Optional[StitchConfig] = None,
                    chunk: int = 8,
                    model_size: Tuple[int, int] = (MODEL_H, MODEL_W),
                    n_frames: Optional[int] = None,
                    pallas_gather: Optional[bool] = None,
                    pallas_fused: Optional[bool] = None,
                    shard_mesh=None,
                    ):
    """Enqueue a whole video's composite without fetching any result.

    Returns an opaque pending state for :func:`composite_finish`. Splitting
    enqueue from collection lets a caller start the NEXT video's uploads
    and compute while this video's chunk downloads drain — the device->host
    link is the pipeline bottleneck, so cross-video overlap is where the
    sustained throughput comes from (see VideoStitcher.stitch_begin).
    """
    config = config or StitchConfig()
    if pallas_fused is None:
        pallas_fused = getattr(config, "pallas_fused", None)
    if pallas_fused is None:
        # Auto (round 5): the ONE-program fused warp kernel
        # (ops/pallas_fused.py) is the TPU default — chip A/B 6.35
        # ms/chunk bgr vs 9.62 v2 window-gather vs 26.2 XLA, yuv420 as
        # one program (no chained conversion). Exact-or-zero + flagged
        # overflows, transparently repaired through the XLA path by
        # composite_finish; per-resolution windows cover 720p/1080p
        # spans. Under a GSPMD mesh it is shard_mapped over the batch
        # axis inside _composite_chunk (non-divisible batches fall back
        # to XLA there); CPU stays on the XLA gather (interpret mode is
        # test-only).
        pallas_fused = (config.warp_mode == "NORMAL"
                        and getattr(config, "coord_stride", 1) == 1
                        and jax.default_backend() == "tpu")
    if pallas_gather is None:
        pallas_gather = getattr(config, "pallas_gather", None)
    if pallas_gather is None:
        # v2 window-gather kernel (round 4): superseded as default by the
        # fused kernel; auto-enables only when the fused path is off
        # (e.g. coord_stride > 1 keeps the coarse-lattice coords).
        pallas_gather = (not pallas_fused
                         and config.warp_mode == "NORMAL"
                         and jax.default_backend() == "tpu")
    out_format = getattr(config, "download_format", "bgr")
    _, H, W, _ = img1.shape
    # img arrays may be LONGER than the true frame count (dp inference pads
    # the frame dim to the data-axis multiple); n_frames is authoritative
    T = int(n_frames) if n_frames else img1.shape[0]
    m1 = scale_meshes(smooth_mesh1, H, W, *model_size)
    m2 = scale_meshes(smooth_mesh2, H, W, *model_size)
    canvas = compute_canvas(m1, m2, config.canvas_bucket)
    # even output dims for 4:2:0 (mp4 encoders require them anyway); the
    # warp's normalization span keeps the TRUE extents, but the returned
    # Canvas must describe the frames actually emitted
    grid_span = (jnp.float32(canvas.out_h), jnp.float32(canvas.out_w))
    oh = canvas.out_h if out_format == "bgr" else canvas.out_h // 2 * 2
    ow = canvas.out_w if out_format == "bgr" else canvas.out_w // 2 * 2
    if (oh, ow) != (canvas.out_h, canvas.out_w):
        canvas = dataclasses.replace(canvas, out_h=oh, out_w=ow)
    if canvas.pad_h > config.max_canvas_h or canvas.pad_w > config.max_canvas_w:
        raise ValueError(
            f"canvas {canvas.pad_h}x{canvas.pad_w} exceeds configured max "
            f"{config.max_canvas_h}x{config.max_canvas_w}")
    offset = jnp.asarray([canvas.x_min, canvas.y_min], jnp.float32)
    # device-side crops are quantized to a 32-aligned superset of the true
    # extent (exact crop happens on host at finish): slice-program shapes
    # then vary per 32-bucket, not per video — each distinct shape is
    # another remote compile on a tunneled chip — for <= 31 extra rows/cols
    # of d2h
    ohq = min(-(-oh // 32) * 32, canvas.pad_h)
    owq = min(-(-ow // 32) * 32, canvas.pad_w)

    if isinstance(img1, np.ndarray):
        img1 = np.ascontiguousarray(img1, dtype=np.uint8)
    if isinstance(img2, np.ndarray):
        img2 = np.ascontiguousarray(img2, dtype=np.uint8)
    pending = []
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        # keep the last chunk the same shape as the others (pad + crop) so
        # only one compiled program exists per canvas bucket
        pad = chunk - (e - s)
        sl = slice(s, e)
        i1 = jnp.asarray(img1[sl])
        i2 = jnp.asarray(img2[sl])
        mm1, mm2 = m1[sl], m2[sl]
        if pad:
            i1 = jnp.pad(i1, ((0, pad), (0, 0), (0, 0), (0, 0)))
            i2 = jnp.pad(i2, ((0, pad), (0, 0), (0, 0), (0, 0)))
            mm1 = jnp.concatenate([mm1, jnp.tile(mm1[-1:], (pad, 1, 1, 1))], 0)
            mm2 = jnp.concatenate([mm2, jnp.tile(mm2[-1:], (pad, 1, 1, 1))], 0)
        # Chained yuv420 (v2 window-gather path only): that composite
        # program emits uint8 BGR and a SECOND jitted program converts to
        # 4:2:0 — XLA fuses the f32 yuv tail poorly downstream of the v2
        # pallas_call (16.0 vs 13.0 ms/chunk, BENCHMARKS round 4). The
        # round-5 FUSED kernel inverts this: its in-program yuv measures
        # 7.25 ms vs 9.99 chained, so the fused default is ONE program
        # again. The repair leg keeps the same shape so repaired chunks
        # match.
        chain_yuv = (pallas_gather and not pallas_fused
                     and out_format == "yuv420")

        def run(i1=i1, i2=i2, mm1=mm1, mm2=mm2, n=e - s,
                pg=pallas_gather, pf=pallas_fused):
            chunk_fmt = "bgr" if chain_yuv else out_format
            fused, viol = _composite_chunk(i1, i2, mm1, mm2, offset,
                                           (canvas.pad_h, canvas.pad_w),
                                           config.warp_mode,
                                           config.fusion_mode,
                                           grid_span=grid_span,
                                           out_format=chunk_fmt,
                                           coord_stride=getattr(
                                               config, "coord_stride", 1),
                                           pallas_gather=pg,
                                           pallas_fused=pf,
                                           shard_mesh=shard_mesh)
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
        # request the d2h copies NOW so chunk k downloads while k+1 computes
        for c in cropped:
            try:
                c.copy_to_host_async()
            except AttributeError:
                pass
        # the repair closure retains the chunk's device inputs only while
        # the pallas path (whose rare window overflows it repairs) is on
        repair = ((lambda r=run: r(pg=False, pf=False)[0])
                  if (pallas_gather or pallas_fused) else None)
        pending.append((cropped, viol, repair))
    return pending, canvas, out_format, (oh, ow)


# process-lifetime telemetry: chunks repaired through the XLA path after a
# window-gather overflow flag (bench.py surfaces it in the BENCH JSON so a
# span regression can never silently turn into a 2.8x perf cliff —
# round-4 verdict weakness 5). threeview/online repairs count here too.
REPAIR_COUNT = 0


def composite_finish(state, timer=None) -> Tuple[np.ndarray, Canvas]:
    """Fetch and assemble the frames enqueued by :func:`composite_begin`."""
    pending, canvas, out_format, (oh, ow) = state
    if timer is not None:
        # warp_fuse = until the last chunk's compute finishes; download =
        # the residual fetch time (d2h copies were already issued async,
        # so the split is attribution, not strict serialization)
        timer.mark("warp_fuse", sync=pending[-1][:2])
    outs_and_viol = jax.device_get([(c, v) for c, v, _ in pending])
    outs = [o for o, _ in outs_and_viol]
    bad = [i for i, (_, v) in enumerate(outs_and_viol) if bool(v)]
    if bad:
        # Exact repair: a flagged chunk had live pixels overflow the
        # window-gather kernel's source window (emitted as exact zeros,
        # never garbage) — recompute it through the XLA packed-patch
        # gather, which is exact everywhere. Never observed on real
        # meshes (diag: live spans <=118 rows vs the 126 budget); the
        # first repair per canvas bucket pays that program's compile.
        global REPAIR_COUNT
        REPAIR_COUNT += len(bad)
        for i in bad:
            outs[i] = jax.device_get(pending[i][2]())
        import warnings

        warnings.warn(
            f"composite window-gather overflow on {len(bad)} chunk(s) "
            "(extreme local TPS compression): repaired exactly through "
            "the XLA gather path.", RuntimeWarning)
    if timer is not None:
        timer.mark("download")
    # exact crop on host (device crops are 32-quantized, see composite_begin)
    if out_format == "yuv420":
        from stabstitch2_tpu.data.video_io import pack_i420_host

        frames = np.concatenate(
            [pack_i420_host(y[:, :oh, :ow], u[:, :oh // 2, :ow // 2],
                            v[:, :oh // 2, :ow // 2]) for y, u, v in outs],
            axis=0)
        return frames, canvas
    return np.concatenate([o[0][:, :oh, :ow] for o in outs], axis=0), canvas


def composite_video(img1: np.ndarray, img2: np.ndarray,
                    smooth_mesh1: jnp.ndarray, smooth_mesh2: jnp.ndarray,
                    config: Optional[StitchConfig] = None,
                    chunk: int = 8,
                    model_size: Tuple[int, int] = (MODEL_H, MODEL_W),
                    timer=None, shard_mesh=None,
                    ) -> Tuple[np.ndarray, Canvas]:
    """Composite a whole video (enqueue + fetch in one call).

    img1/img2: [T, H, W, 3] uint8 (host or device); smooth_mesh*:
    [T, GH+1, GW+1, 2] model-resolution meshes. Returns (frames, canvas);
    frames are uint8 BGR [T,oh,ow,3] or packed I420 [T,oh*3//2,ow]
    depending on config.download_format.
    """
    state = composite_begin(img1, img2, smooth_mesh1, smooth_mesh2,
                            config=config, chunk=chunk,
                            model_size=model_size, shard_mesh=shard_mesh)
    return composite_finish(state, timer=timer)
