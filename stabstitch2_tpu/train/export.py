"""Offline motion export (the inter-stage filesystem bus).

Parity targets: SpatialWarp/Codes/test_ssd.py:62-84 and
TemporalWarp/Codes/test_ssd.py:75-103 — run the trained spatial/temporal
nets over the TRAINING split and write per-frame ``.npy`` motions next to
the frames (SpatialMotion1/2 = mesh - rigid_mesh [GH+1, GW+1, 2];
TemporalMotion1/2 with zeros for each video's first frame). SmoothWarp
training consumes these.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from stabstitch2_tpu.data.video_io import list_videos, load_view


def export_spatial_motions(stitcher, dataset_dir: str,
                           max_videos: Optional[int] = None) -> int:
    """Write SpatialMotion1/2/NNNNNN.npy for every frame of every video."""
    count = 0
    videos = list_videos(dataset_dir)[:max_videos]
    for vd in videos:
        _, lo1 = load_view(vd, "video1", (stitcher.model_h, stitcher.model_w),
                           want_hi=False)
        _, lo2 = load_view(vd, "video2", (stitcher.model_h, stitcher.model_w),
                           want_hi=False)
        T = min(len(lo1), len(lo2))
        m1, m2 = stitcher._motion.spatial(lo1[:T], lo2[:T])
        m1, m2 = np.asarray(m1), np.asarray(m2)
        for name, m in (("SpatialMotion1", m1), ("SpatialMotion2", m2)):
            d = os.path.join(vd, name)
            os.makedirs(d, exist_ok=True)
            for t in range(T):
                np.save(os.path.join(d, f"{t:06d}.npy"), m[t])
        count += T
    return count


def export_temporal_motions(stitcher, dataset_dir: str,
                            max_videos: Optional[int] = None) -> int:
    """Write TemporalMotion1/2/NNNNNN.npy (zero motion for frame 0)."""
    count = 0
    videos = list_videos(dataset_dir)[:max_videos]
    for vd in videos:
        # truncate BOTH views to the common length so every exported
        # stream is frame-aligned with the SpatialMotion exports (views
        # may have unequal frame counts)
        los = {view: load_view(vd, view,
                               (stitcher.model_h, stitcher.model_w),
                               want_hi=False)[1]
               for view in ("video1", "video2")}
        T = min(len(v) for v in los.values())
        for view, name in (("video1", "TemporalMotion1"),
                           ("video2", "TemporalMotion2")):
            motions = np.asarray(stitcher._motion.temporal(los[view][:T]))
            d = os.path.join(vd, name)
            os.makedirs(d, exist_ok=True)
            for t in range(len(motions)):
                np.save(os.path.join(d, f"{t:06d}.npy"), motions[t])
            count += len(motions)
    return count
