"""Synthetic two-view shaky video clips for integration tests and benches.

Renders a wide panorama texture and cuts two overlapping, independently
shaking crops from it — the same structure as a StabStitch-D sample
(two temporally synchronized views with ~50% overlap and camera shake).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _texture(h: int, w: int, seed: int) -> np.ndarray:
    """Scene-like texture: smooth background + geometric structure.

    Rectangles/circles/lines give the cost volumes and photometric losses
    real edges and corners to lock onto (pure noise is a worst case for
    CNN alignment and makes demos unreadable).
    """
    import cv2

    rng = np.random.default_rng(seed)
    small = rng.uniform(40, 215, (h // 16, w // 16, 3)).astype(np.float32)
    tex = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    for _ in range(24):  # buildings / signs
        x0, y0 = rng.integers(0, w - 20), rng.integers(0, h - 20)
        x1 = x0 + int(rng.integers(12, max(13, w // 4)))
        y1 = y0 + int(rng.integers(12, max(13, h // 4)))
        color = rng.uniform(0, 255, 3).tolist()
        cv2.rectangle(tex, (int(x0), int(y0)), (int(x1), int(y1)), color,
                      thickness=-1 if rng.random() < 0.6 else 2)
    for _ in range(14):  # round objects
        c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        cv2.circle(tex, c, int(rng.integers(5, 25)),
                   rng.uniform(0, 255, 3).tolist(), -1)
    for _ in range(16):  # edges / wires
        p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        cv2.line(tex, p0, p1, rng.uniform(0, 255, 3).tolist(),
                 int(rng.integers(1, 4)))
    # mild high-frequency detail on top
    small2 = rng.uniform(-20, 20, (h // 4, w // 4, 3)).astype(np.float32)
    tex = tex + cv2.resize(small2, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(tex, 0, 255)


def make_two_view_clip(num_frames: int = 9, height: int = 360,
                       width: int = 480, overlap: float = 0.5,
                       shake_px: float = 4.0, seed: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (view1, view2) uint8 [T, H, W, 3] BGR-ish clips."""
    rng = np.random.default_rng(seed)
    dx = int(width * (1.0 - overlap))          # horizontal view separation
    margin = int(4 * shake_px) + 8
    pano = _texture(height + 2 * margin, width + dx + 2 * margin, seed)

    def random_walk(n):
        steps = rng.normal(0, shake_px * 0.6, (n, 2))
        walk = np.cumsum(steps, axis=0)
        return np.clip(walk, -shake_px * 2, shake_px * 2)

    shake1 = random_walk(num_frames)
    shake2 = random_walk(num_frames)

    v1, v2 = [], []
    for t in range(num_frames):
        o1 = (margin + shake1[t]).astype(int)
        o2 = (margin + shake2[t]).astype(int)
        v1.append(pano[o1[0]:o1[0] + height, o1[1]:o1[1] + width])
        v2.append(pano[o2[0]:o2[0] + height, o2[1] + dx:o2[1] + dx + width])
    return (np.stack(v1).astype(np.uint8), np.stack(v2).astype(np.uint8))


def write_clip_dirs(root: str, num_frames: int = 9, height: int = 360,
                    width: int = 480, seed: int = 0, video_name: str = "clip0",
                    overlap: float = 0.5) -> str:
    """Write a clip as the reference's directory layout: video1/2/*.jpg."""
    import os

    import cv2

    v1, v2 = make_two_view_clip(num_frames, height, width, seed=seed,
                                overlap=overlap)
    vd = os.path.join(root, video_name)
    for view, frames in (("video1", v1), ("video2", v2)):
        d = os.path.join(vd, view)
        os.makedirs(d, exist_ok=True)
        for t in range(len(frames)):
            cv2.imwrite(os.path.join(d, f"{t:06d}.jpg"), frames[t])
    return vd
