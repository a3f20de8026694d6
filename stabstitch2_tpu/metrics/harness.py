"""Per-video / per-dataset metric evaluation driver.

Parity target: the evaluation flow of test_metric_ssd.py — motion phases
identical to inference, then per-frame PSNR/SSIM on the separately-warped
360x480 views (NORMAL mode, no blending, :506-524), stability from the
continued view-2 smooth path (:444-469), distortion from the view-2 smooth
meshes (:473-501), aggregated per StabStitch-D difficulty category
(:234-237) and overall.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import jax

from stabstitch2_tpu.metrics.psnr_ssim import psnr, ssim
from stabstitch2_tpu.metrics.scores import (
    continue_paths,
    distortion_score,
    stability_score,
)
from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.ops.tps import tps_warp_with_mask
from stabstitch2_tpu.pipeline.smoothing import smooth_all_windows
from stabstitch2_tpu.pipeline.transport import stitched_meshes, transport_both_views

# module-level jitted batch metrics: constructing fresh jit wrappers per
# video would recompile the (expensive) SSIM graph for every video even at
# identical shapes (jit caches key on callable identity)
_psnr_batch = jax.jit(jax.vmap(psnr))
_ssim_batch = jax.jit(jax.vmap(ssim))

# StabStitch-D difficulty categories (test_metric_ssd.py:234-237)
SSD_CATEGORIES = {
    "RE": ["00000107", "00000101", "MR002", "S13", "S28"],
    "LL": ["0000074", "0000085", "0000090", "0000099", "00000100"],
    "LT": ["0000021", "0000037", "0000040", "00000140", "ML001"],
    "MF": ["00000168", "00000175", "00000224", "MR006", "SF34"],
}


def _warp_views(lo: jnp.ndarray, mesh: jnp.ndarray, chunk: int = 8
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NORMAL-warp normalized frames back to 0..255 + coverage masks.

    lo: [T, H, W, 3] in [-1,1]; mesh: [T, GH+1, GW+1, 2] model-res.
    Returns (warped [T, H, W, 3] in 0..255, mask [T, H, W]). The mask is
    computed arithmetically (ops/interp.py:bilinear_mask) instead of
    warping a concatenated ones-plane like the reference — identical
    values, but a >3-channel gather lowers ~1000x slower on TPU
    (BENCHMARKS.md 'TPU kernel findings').
    """
    T, H, W, _ = lo.shape
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    from stabstitch2_tpu.ops.pallas_warp import pallas_available

    imgs, masks = [], []
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        img = (lo[s:e] + 1.0) * 127.5
        src = mesh_points(normalize_mesh(mesh[s:e], H, W))
        tgt = jnp.broadcast_to(norm_rigid_pts[None], src.shape)
        w, m = tps_warp_with_mask(img, src, tgt, (H, W), mode="NORMAL",
                                  use_pallas=pallas_available())
        imgs.append(w)
        masks.append(m)
    return jnp.concatenate(imgs, 0), jnp.concatenate(masks, 0)


def evaluate_video(stitcher, lo1: np.ndarray, lo2: np.ndarray
                   ) -> Dict[str, float]:
    """All four metrics for one video (model-resolution frames [-1,1])."""
    lo1j, lo2j = jnp.asarray(lo1), jnp.asarray(lo2)
    mh, mw = stitcher.model_h, stitcher.model_w

    smotion1, smotion2 = stitcher._motion.spatial(lo1j, lo2j)
    tmotion1 = stitcher._motion.temporal(lo1j)
    tmotion2 = stitcher._motion.temporal(lo2j)
    ts1, ts2 = transport_both_views(tmotion1, smotion1, tmotion2, smotion2,
                                    mh, mw)
    smesh1 = stitched_meshes(smotion1, mh, mw)
    smesh2 = stitched_meshes(smotion2, mh, mw)
    smooth = smooth_all_windows(stitcher.smooth_net, stitcher.smooth_vars,
                                smesh1, smesh2, ts1, ts2,
                                window=stitcher.config.window)

    # stability + distortion on view 2, both original and smoothed
    # (the reference prints the before/after pair, test_metric_ssd.py:444-501)
    ori_path2, smooth_path2 = continue_paths(smooth["win_ori_path2"],
                                             smooth["win_smooth_path2"])
    stab_ori = float(stability_score(ori_path2))
    stab = float(stability_score(smooth_path2))
    dist_ori = float(distortion_score(smooth["ori_mesh2"]))
    dist = float(distortion_score(smooth["smooth_mesh2"]))

    # alignment PSNR/SSIM from separately-warped views
    w1, m1 = _warp_views(lo1j, smooth["smooth_mesh1"])
    w2, m2 = _warp_views(lo2j, smooth["smooth_mesh2"])
    ov = (m1 * m2)[..., None]
    a = w1 * ov
    b = w2 * ov
    psnrs = _psnr_batch(a, b)
    ssims = _ssim_batch(a, b)

    return {"psnr": float(jnp.mean(psnrs)), "ssim": float(jnp.mean(ssims)),
            "stability": stab, "distortion": dist,
            "stability_ori": stab_ori, "distortion_ori": dist_ori}


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
            want_hi=False)
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
