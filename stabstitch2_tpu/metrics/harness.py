"""Per-video / per-dataset metric evaluation driver.

Parity target: the evaluation flow of test_metric_ssd.py — motion phases
identical to inference, then per-frame PSNR/SSIM on the separately-warped
360x480 views (NORMAL mode, no blending, :506-524), stability from the
continued view-2 smooth path (:444-469), distortion from the view-2 smooth
meshes (:473-501), aggregated per StabStitch-D difficulty category
(:234-237) and overall.

TPU-first design (the reference loops eagerly per frame/window): the
motion+smooth phases reuse the stitch path's fused, 16-frame-bucketed
programs (VideoStitcher.motion_smooth), the stability/distortion scores are
ONE jitted program per bucket with the true frame count as a traced scalar
(masked reductions, no recompile across lengths), and the PSNR/SSIM tail
runs warp+score fused per fixed-size frame chunk — so a dataset sweep
compiles one program set per canvas bucket and stays dispatch-light.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.metrics.psnr_ssim import psnr, ssim
from stabstitch2_tpu.metrics.scores import (
    continue_paths,
    distortion_score_masked,
    stability_score_masked,
)
from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.ops.tps import tps_warp_with_mask

# Metric-tail chunk: must divide the smooth phase's 16-frame bucket so every
# chunk of a padded video shares one compiled shape.
_CHUNK = 8

# StabStitch-D difficulty categories (test_metric_ssd.py:234-237)
SSD_CATEGORIES = {
    "RE": ["00000107", "00000101", "MR002", "S13", "S28"],
    "LL": ["0000074", "0000085", "0000090", "0000099", "00000100"],
    "LT": ["0000021", "0000037", "0000040", "00000140", "ML001"],
    "MF": ["00000168", "00000175", "00000224", "MR006", "SF34"],
}


# module-level jitted programs: constructing fresh jit wrappers per video
# would recompile for every video even at identical shapes (jit caches key
# on callable identity)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _warp_psnr_ssim_chunk(lo1, lo2, mesh1, mesh2, use_pallas: bool
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp one chunk of both views and score alignment, fused.

    lo*: [C, H, W, 3] in [-1,1]; mesh*: [C, GH+1, GW+1, 2] model-res.
    Returns (psnr [C], ssim [C]). NORMAL warp back to 0..255 with the
    arithmetic coverage mask (a >3-channel gather lowers ~1000x slower on
    TPU, BENCHMARKS.md 'TPU kernel findings'); overlap-masked per-frame
    scores like the reference (test_metric_ssd.py:506-524).
    """
    C, H, W, _ = lo1.shape
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    tgt = jnp.broadcast_to(norm_rigid_pts[None], (C,) + norm_rigid_pts.shape)

    def warp(lo, mesh):
        img = (lo + 1.0) * 127.5
        src = mesh_points(normalize_mesh(mesh, H, W))
        return tps_warp_with_mask(img, src, tgt, (H, W), mode="NORMAL",
                                  use_pallas=use_pallas)

    w1, m1 = warp(lo1, mesh1)
    w2, m2 = warp(lo2, mesh2)
    ov = (m1 * m2)[..., None]
    a = w1 * ov
    b = w2 * ov
    return jax.vmap(psnr)(a, b), jax.vmap(ssim)(a, b)


@jax.jit
def _stability_distortion(win_ori2, win_smooth2, ori_mesh2, smooth_mesh2,
                          n_frames):
    """Stability + distortion (before/after) as ONE program per bucket.

    Inputs are the PADDED smooth-phase outputs (win_*: [Tb-6, 7, ...],
    meshes: [Tb, ...]); ``n_frames`` is the traced true frame count —
    masked reductions make every video length inside a bucket share the
    compiled program. Reference prints the before/after pair
    (test_metric_ssd.py:444-501).
    """
    ori_path2, smooth_path2 = continue_paths(win_ori2, win_smooth2)
    return (stability_score_masked(ori_path2, n_frames),
            stability_score_masked(smooth_path2, n_frames),
            distortion_score_masked(ori_mesh2, n_frames),
            distortion_score_masked(smooth_mesh2, n_frames))


def _pad_frames(x: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))], 0)


@jax.jit
def _normalize_u8(x_u8: jnp.ndarray) -> jnp.ndarray:
    return x_u8.astype(jnp.float32) / 127.5 - 1.0


def evaluate_video(stitcher, lo1: np.ndarray, lo2: np.ndarray
                   ) -> Dict[str, float]:
    """All four metrics for one video.

    lo*: model-resolution frames — float [-1,1], or uint8 BGR (preferred
    at dataset scale: frames cross the host->device link at 1 byte/px and
    normalize on device; `load_video_pair(normalize=False)` produces
    them).
    """
    from stabstitch2_tpu.ops.pallas_warp import pallas_available

    lo1j, lo2j = jnp.asarray(lo1), jnp.asarray(lo2)
    if lo1j.dtype == jnp.uint8:
        lo1j, lo2j = _normalize_u8(lo1j), _normalize_u8(lo2j)
    T = lo1j.shape[0]

    # phases 1-4 via the stitch path's fused, bucketed programs; keep the
    # padded outputs so the score program is shared across lengths
    smooth = stitcher.motion_smooth(lo1j, lo2j, crop=False)
    Tb = smooth["smooth_mesh1"].shape[0]

    stab_ori, stab, dist_ori, dist = _stability_distortion(
        smooth["win_ori_path2"], smooth["win_smooth_path2"],
        smooth["ori_mesh2"], smooth["smooth_mesh2"], jnp.int32(T))

    # alignment PSNR/SSIM from separately-warped views, fused per chunk
    lo1p = _pad_frames(lo1j, Tb)
    lo2p = _pad_frames(lo2j, Tb)
    use_pallas = bool(pallas_available())
    psnrs, ssims = [], []
    for s in range(0, Tb, _CHUNK):
        e = s + _CHUNK
        p, q = _warp_psnr_ssim_chunk(lo1p[s:e], lo2p[s:e],
                                     smooth["smooth_mesh1"][s:e],
                                     smooth["smooth_mesh2"][s:e],
                                     use_pallas)
        psnrs.append(p)
        ssims.append(q)
    psnrs = np.asarray(jnp.concatenate(psnrs))[:T]
    ssims = np.asarray(jnp.concatenate(ssims))[:T]

    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "stability": float(stab), "distortion": float(dist),
            "stability_ori": float(stab_ori),
            "distortion_ori": float(dist_ori)}


def evaluate_dataset(stitcher, dataset_dir: str,
                     categories: Optional[Dict[str, List[str]]] = None,
                     max_videos: Optional[int] = None) -> Dict:
    """Per-category + average report over a dataset split directory."""
    from stabstitch2_tpu.data.video_io import list_videos, load_video_pair

    categories = SSD_CATEGORIES if categories is None else categories
    per_video = {}
    videos = list_videos(dataset_dir)
    if max_videos:
        videos = videos[:max_videos]
    for vd in videos:
        import os

        _, lo1, _, lo2 = load_video_pair(
            vd, model_size=(stitcher.model_h, stitcher.model_w),
            want_hi=False, normalize=False)  # uint8 uploads, 1 byte/px
        per_video[os.path.basename(vd)] = evaluate_video(stitcher, lo1, lo2)

    def agg(names):
        rows = [per_video[n] for n in names if n in per_video]
        if not rows:
            return None
        return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}

    report = {"per_video": per_video, "average": agg(list(per_video))}
    for cat, names in categories.items():
        report[cat] = agg(names)
    return report
