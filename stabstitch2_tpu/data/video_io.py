"""Host-side video IO: frame-directory loading and mp4 encoding.

Mirrors the reference's inline loaders (test_online_ssd.py:250-278): each
video is a directory with ``video1/*.jpg`` and ``video2/*.jpg`` (sorted);
frames are used both at native resolution (composite) and resized to
360x480 normalized [-1,1] (model input).
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import cv2
import numpy as np

from stabstitch2_tpu.config import MODEL_H, MODEL_W


def list_videos(dataset_dir: str) -> List[str]:
    """Sorted video directories under a dataset split directory."""
    return sorted(p for p in glob.glob(os.path.join(dataset_dir, "*"))
                  if os.path.isdir(p))


def list_frames(video_dir: str, view: str) -> List[str]:
    return sorted(glob.glob(os.path.join(video_dir, view, "*.jpg")))


def load_view(video_dir: str, view: str,
              model_size: Tuple[int, int] = (MODEL_H, MODEL_W),
              use_native: bool = True,
              want_hi: bool = True,
              normalize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Load one view. Returns (hires_uint8 [T,H,W,3], model_float [-1,1]).

    Uses the native threaded decoder (native/frameloader.cpp) when built,
    falling back to cv2. Both produce BGR uint8 + half-pixel bilinear
    resize; JPEG IDCT rounding may differ by ~1 LSB between decoders.
    ``want_hi=False`` returns (None, lo) without materializing the
    full-resolution frames — motion export and the metric harness only
    consume the model-resolution stream, and hi-res video is ~GBs.
    ``normalize=False`` returns the model stream as uint8 (1 byte/px):
    the metric harness uploads it raw and normalizes ON DEVICE, cutting
    the host->device bytes 4x (the dominant metric-run cost on a
    bandwidth-bound link).
    """
    paths = list_frames(video_dir, view)
    if not paths:
        raise FileNotFoundError(f"no frames in {video_dir}/{view}")
    mh, mw = model_size
    if use_native:
        from stabstitch2_tpu.data import native

        if native.available():
            try:
                hi, lo_u8 = native.decode_batch(paths, lo_size=(mh, mw),
                                                want_hi=want_hi)
                if not normalize:
                    return hi, lo_u8
                return hi, lo_u8.astype(np.float32) / 127.5 - 1.0
            except (IOError, RuntimeError):
                pass  # non-jpeg / size-mismatch: fall back to cv2
    hi, lo = [], []
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            raise IOError(f"failed to read {p}")
        if want_hi:
            hi.append(img)
        small = cv2.resize(img, (mw, mh))
        if normalize:
            small = small.astype(np.float32) / 127.5 - 1.0
        lo.append(small)
    return (np.stack(hi) if want_hi else None), np.stack(lo)


def load_video_pair(video_dir: str,
                    model_size: Tuple[int, int] = (MODEL_H, MODEL_W),
                    want_hi: bool = True, normalize: bool = True):
    """Both views of a two-view video directory (truncated to the min T)."""
    hi1, lo1 = load_view(video_dir, "video1", model_size, want_hi=want_hi,
                         normalize=normalize)
    hi2, lo2 = load_view(video_dir, "video2", model_size, want_hi=want_hi,
                         normalize=normalize)
    T = min(len(lo1), len(lo2))
    if not want_hi:
        return None, lo1[:T], None, lo2[:T]
    return hi1[:T], lo1[:T], hi2[:T], lo2[:T]


def bgr_to_i420(frames: np.ndarray) -> np.ndarray:
    """uint8 BGR [T,H,W,3] (H, W even) -> packed I420 [T, H*3//2, W].

    Host-side prep for 1.5-byte/px uploads (cv2 SIMD, ~0.5 ms/frame); the
    device unpacks with ops.yuv.i420_to_bgr. Falls back to the caller for
    odd dimensions (I420 requires even H and W).
    """
    T, H, W, _ = frames.shape
    if H % 2 or W % 2:
        raise ValueError(f"I420 needs even dims, got {H}x{W}")
    return np.stack([cv2.cvtColor(frames[t], cv2.COLOR_BGR2YUV_I420)
                     for t in range(T)])


def pack_i420_host(y: np.ndarray, u: np.ndarray, v: np.ndarray
                   ) -> np.ndarray:
    """Host twin of ops.yuv.pack_i420: (Y [..,H,W], U/V [..,H/2,W/2]) ->
    packed I420 [.., H*3//2, W]. Planes are contiguous (cv2 layout); works
    batched ([T,H,W]) or single-frame ([H,W])."""
    y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
    lead = y.shape[:-2]
    H, W = y.shape[-2:]
    flat = np.concatenate([y.reshape(*lead, -1), u.reshape(*lead, -1),
                           v.reshape(*lead, -1)], axis=-1)
    return flat.reshape(*lead, H * 3 // 2, W)


def write_video(path: str, frames: np.ndarray, fps: int = 30,
                frame_format: str = "bgr") -> None:
    """Encode frames as mp4 (reference: fourcc mp4v).

    frame_format 'bgr': float/uint8 BGR [T,H,W,3]. 'i420': packed YUV 4:2:0
    [T, H*3//2, W] uint8 (the compositor's transfer-thin output); each frame
    is expanded to BGR with cv2 right before the encoder, which converts
    back to 4:2:0 internally — no extra quality loss.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if frame_format == "i420":
        T, H15, W = frames.shape
        H = H15 * 2 // 3
    else:
        T, H, W, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (W, H))
    # cv2 fails SILENTLY on an unopenable target (e.g. a path without a
    # container extension): writes become no-ops and the caller would
    # report success over a file that never existed (found by driving
    # `cli stitch-multi --output <dir-without-.mp4>`, round 5)
    if not writer.isOpened():
        raise IOError(
            f"cv2.VideoWriter could not open {path!r} (mp4v {W}x{H}; "
            "does the path end in .mp4 and the directory exist?)")
    try:
        for t in range(T):
            if frame_format == "i420":
                writer.write(cv2.cvtColor(frames[t], cv2.COLOR_YUV2BGR_I420))
            else:
                writer.write(np.clip(frames[t], 0, 255).astype(np.uint8))
    finally:
        writer.release()
