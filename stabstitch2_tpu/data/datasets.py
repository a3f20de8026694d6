"""Training dataset samplers, replicating the reference's three recipes.

Parity targets:
- SpatialWarp/Codes/dataset.py: per-video frame pairs, skip the first 2
  frames for training, resize 480x360 -> [-1,1], random pair swap p=0.5.
- TemporalWarp/Codes/dataset.py: view-2 ONLY; sliding windows of
  ``train_frame_num``=4; each sample picks 2 sorted random frames from the
  window (random temporal gap).
- SmoothWarp/Codes/dataset.py: 6 aligned streams (TemporalMotion1/2 npy,
  SpatialMotion1/2 npy, video1/2 jpg); windows of 12; each sample picks
  ``frame_num`` sorted random indices; videos shorter than 12 are skipped.

Implementation is plain numpy + cv2 with a background-thread prefetcher
(one host core here; the TPU never waits on more than one batch). Frames
are yielded as uint8 — the train steps normalize on device, so batches
cross the host<->device link 4x cheaper.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Tuple

import cv2
import numpy as np

from stabstitch2_tpu.config import MODEL_H, MODEL_W


def _load_image(path: str, width: int = MODEL_W,
                height: int = MODEL_H) -> np.ndarray:
    """uint8 HWC frame — normalization to [-1,1] happens ON DEVICE inside
    the train steps (uint8 batches cross the host<->device link 4x cheaper;
    see train/common.py:normalize_images)."""
    img = cv2.imread(path)
    return cv2.resize(img, (width, height))


def _decode_many(paths: List[str], mh: int, mw: int) -> np.ndarray:
    """Batch-decode frames at model resolution (native C++ when built)."""
    from stabstitch2_tpu.data import native

    if native.available():
        try:
            _, lo = native.decode_batch(paths, lo_size=(mh, mw),
                                        want_hi=False, threads=2)
            return lo
        except (IOError, RuntimeError):
            pass
    return np.stack([_load_image(p, mw, mh) for p in paths])


def _video_dirs(root: str) -> List[str]:
    return sorted(p for p in glob.glob(os.path.join(root, "*"))
                  if os.path.isdir(p))


class SpatialPairDataset:
    """Cross-view frame pairs for SpatialWarp training."""

    def __init__(self, data_path: str, training: bool = True,
                 seed: int = 0, model_size=(MODEL_H, MODEL_W)):
        self.training = training
        self.model_size = model_size
        self.rng = np.random.default_rng(seed)
        self.samples: List[Tuple[str, str]] = []
        skip = 2 if training else 0
        for vd in _video_dirs(data_path):
            f1 = sorted(glob.glob(os.path.join(vd, "video1", "*.jpg")))[skip:]
            f2 = sorted(glob.glob(os.path.join(vd, "video2", "*.jpg")))[skip:]
            self.samples += list(zip(f1, f2))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        p1, p2 = self.samples[i]
        mh, mw = self.model_size
        a, b = _load_image(p1, mw, mh), _load_image(p2, mw, mh)
        if self.training and self.rng.random() < 0.5:
            a, b = b, a  # random view swap (dataset.py:49-53)
        return a, b

    def get_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        """Batched fast path: one native decode for all 2B frames."""
        mh, mw = self.model_size
        pairs = [self.samples[int(i)] for i in indices]
        flat = [p for pair in pairs for p in pair]
        imgs = _decode_many(flat, mh, mw)
        a, b = imgs[0::2], imgs[1::2]
        if self.training:
            swap = self.rng.random(len(pairs)) < 0.5
            a = np.where(swap[:, None, None, None], b, a)
            b_out = np.where(swap[:, None, None, None],
                             imgs[0::2], b)
            return a, b_out
        return a, b


class TemporalPairDataset:
    """Random-gap consecutive-ish pairs from view 2 for TemporalWarp."""

    def __init__(self, data_path: str, train_frame_num: int = 4,
                 seed: int = 0, model_size=(MODEL_H, MODEL_W)):
        self.rng = np.random.default_rng(seed)
        self.model_size = model_size
        self.train_frame_num = train_frame_num
        self.windows: List[List[str]] = []
        for vd in _video_dirs(data_path):
            frames = sorted(glob.glob(os.path.join(vd, "video2", "*.jpg")))
            for s in range(len(frames) - train_frame_num + 1):
                self.windows.append(frames[s:s + train_frame_num])

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        w = self.windows[i]
        a, b = sorted(self.rng.choice(len(w), size=2, replace=False))
        mh, mw = self.model_size
        return _load_image(w[a], mw, mh), _load_image(w[b], mw, mh)


class SmoothWindowDataset:
    """Aligned motion+frame windows for SmoothWarp training.

    Each item: (tmotion1, tmotion2, smotion1, smotion2, img1, img2), all
    [L, ...] with L = frame_num + train_sqe - 1 sorted random picks from a
    12-frame window.
    """

    def __init__(self, data_path: str, selected_frames: int = 8,
                 train_frame_num: int = 12, seed: int = 0,
                 model_size=(MODEL_H, MODEL_W)):
        self.rng = np.random.default_rng(seed)
        self.model_size = model_size
        self.selected = selected_frames
        self.train_frame_num = train_frame_num
        self.windows = []  # list of dicts of aligned path lists
        for vd in _video_dirs(data_path):
            streams = {
                "tm1": sorted(glob.glob(os.path.join(vd, "TemporalMotion1", "*.npy"))),
                "tm2": sorted(glob.glob(os.path.join(vd, "TemporalMotion2", "*.npy"))),
                "sm1": sorted(glob.glob(os.path.join(vd, "SpatialMotion1", "*.npy"))),
                "sm2": sorted(glob.glob(os.path.join(vd, "SpatialMotion2", "*.npy"))),
                "img1": sorted(glob.glob(os.path.join(vd, "video1", "*.jpg"))),
                "img2": sorted(glob.glob(os.path.join(vd, "video2", "*.jpg"))),
            }
            motion_keys = ("tm1", "tm2", "sm1", "sm2")
            empty = [k for k in motion_keys if not streams[k]]
            if empty and len(empty) < len(motion_keys):
                # PARTIAL exports (e.g. only temporal was run): fail loudly
                # instead of silently skipping every video. A video with NO
                # exports at all is the normal skip case (export-motions
                # skips videos shorter than the window).
                raise FileNotFoundError(
                    f"{vd}: missing streams {empty} — run "
                    f"`cli export-motions` to generate the motion exports")
            # mirror the partial-export check for the image streams: motion
            # exports present but an empty video1/video2 jpg list is an
            # equally broken layout and must not be silently skipped via
            # the min() below
            if not empty:
                no_imgs = [k for k in ("img1", "img2") if not streams[k]]
                if no_imgs:
                    raise FileNotFoundError(
                        f"{vd}: motion exports exist but image stream(s) "
                        f"{no_imgs} are empty — broken dataset layout")
            # views can have unequal lengths (the loaders truncate to the
            # min) — windows must fit the SHORTEST stream or __getitem__
            # slices run short
            n = min(len(v) for v in streams.values())
            if n < train_frame_num:  # skip short videos (dataset.py:36-38)
                continue
            streams = {k: v[:n] for k, v in streams.items()}
            for s in range(n - train_frame_num + 1):
                self.windows.append({k: v[s:s + train_frame_num]
                                     for k, v in streams.items()})

    def __len__(self):
        return len(self.windows)

    def __getitem__(self, i: int):
        w = self.windows[i]
        idx = np.sort(self.rng.choice(self.train_frame_num,
                                      size=self.selected, replace=False))
        tm1 = np.stack([np.load(w["tm1"][j]).astype(np.float32) for j in idx])
        tm2 = np.stack([np.load(w["tm2"][j]).astype(np.float32) for j in idx])
        sm1 = np.stack([np.load(w["sm1"][j]).astype(np.float32) for j in idx])
        sm2 = np.stack([np.load(w["sm2"][j]).astype(np.float32) for j in idx])
        mh, mw = self.model_size
        im1 = np.stack([_load_image(w["img1"][j], mw, mh) for j in idx])
        im2 = np.stack([_load_image(w["img2"][j], mw, mh) for j in idx])
        return tm1, tm2, sm1, sm2, im1, im2


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   prefetch: int = 2) -> Iterator:
    """Threaded batching iterator: stacks dataset items into numpy batches."""
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    stops = len(order) - (len(order) % batch_size if drop_last else 0)

    get_batch = getattr(dataset, "get_batch", None)

    stop = threading.Event()

    def _put(q, item) -> bool:
        # bounded put that notices consumer abandonment (generator closed
        # mid-epoch, e.g. max_steps_per_epoch) — without this, the thread
        # would block on a full queue forever, pinning decoded batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def produce(q: queue.Queue):
        try:
            for s in range(0, stops, batch_size):
                idx = order[s:s + batch_size]
                if get_batch is not None:
                    batch = get_batch(idx)
                else:
                    items = [dataset[int(i)] for i in idx]
                    if isinstance(items[0], tuple):
                        batch = tuple(np.stack(col) for col in zip(*items))
                    else:
                        batch = np.stack(items)
                if not _put(q, batch):
                    return
        except BaseException as e:  # surface decode errors on the consumer
            _put(q, e)
            return
        _put(q, None)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()  # unblock the producer if the consumer bailed early
