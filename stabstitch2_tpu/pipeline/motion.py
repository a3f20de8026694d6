"""Motion estimation phases: spatial (cross-view) and temporal (inter-frame).

Parity targets: PHASE 1/2 of the reference driver
(test_online_ssd.py:284-299). The reference runs the spatial net once per
frame and the temporal net sequentially with feature caching; here both
phases are chunked batches with one compiled program each (pad-to-chunk so
XLA compiles a single shape).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.models import SpatialNet, TemporalNet
from stabstitch2_tpu.models.spatial import spatial_motions
from stabstitch2_tpu.models.temporal import TemporalNet as _TN


@functools.partial(jax.jit, static_argnums=(1,))
def _pad_to_jit(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat-last pad of the leading axis, as ONE compiled program.

    Compiled (not eager) on purpose: under dp inference the inputs are
    GSPMD-sharded over the device mesh, and a chain of eager ops on
    sharded arrays dispatches a tiny multi-device rendezvous per op —
    observed to SIGABRT XLA:CPU's 8-virtual-device runtime mid-suite
    (tile inside the non-divisible-T mesh test), and pure overhead on a
    real multi-chip mesh. One jitted program keeps the padding on the
    well-tested compiled-collective path; the jit cache keys on
    (shape, n), both drawn from the small fixed chunk geometry.
    """
    pad = n - x.shape[0]
    return jnp.concatenate(
        [x, jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))], 0)


@dataclasses.dataclass
class MotionEstimator:
    """Holds the two alignment nets and their jitted, chunked drivers."""

    spatial_net: SpatialNet
    spatial_vars: dict
    temporal_net: TemporalNet
    temporal_vars: dict
    chunk: int = 8

    def __post_init__(self):
        @functools.partial(jax.jit)
        def _spatial(variables, img1, img2):
            off1, mref, mtgt = self.spatial_net.apply(variables, img1, img2,
                                                      False)
            out = spatial_motions(off1, mref, mtgt,
                                  img1.shape[1], img1.shape[2])
            return out["motion1"], out["motion2"]

        @functools.partial(jax.jit)
        def _features(variables, imgs):
            return self.temporal_net.apply(variables, imgs, False,
                                           method=_TN.features)

        @functools.partial(jax.jit)
        def _pair_motion(variables, f_prev, f_next):
            return self.temporal_net.apply(variables, f_prev, f_next,
                                           method=_TN.motion_from_features)

        self._spatial = _spatial
        self._features = _features
        self._pair_motion = _pair_motion

    # -- helpers -----------------------------------------------------------

    def _chunks(self, n: int):
        for s in range(0, n, self.chunk):
            yield s, min(s + self.chunk, n)

    @staticmethod
    def _pad_to(x: jnp.ndarray, n: int) -> jnp.ndarray:
        pad = n - x.shape[0]
        if pad == 0:
            return x
        return _pad_to_jit(x, n)

    # -- phases --------------------------------------------------------------

    def spatial(self, frames1: jnp.ndarray, frames2: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frames*: [T, H, W, 3] normalized [-1,1]. Returns (motion1, motion2)."""
        T = frames1.shape[0]
        m1, m2 = [], []
        for s, e in self._chunks(T):
            a = self._pad_to(frames1[s:e], self.chunk)
            b = self._pad_to(frames2[s:e], self.chunk)
            o1, o2 = self._spatial(self.spatial_vars, a, b)
            m1.append(o1[:e - s])
            m2.append(o2[:e - s])
        return jnp.concatenate(m1, 0), jnp.concatenate(m2, 0)

    def spatial_chunks(self, chunks1, chunks2, total: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Like :meth:`spatial` but over pre-uploaded device chunk lists —
        chunk k's compute is enqueued as soon as chunk k's upload lands,
        overlapping host->device streaming with the backbone."""
        m1, m2 = [], []
        done = 0
        for a, b in zip(chunks1, chunks2):
            o1, o2 = self._spatial(self.spatial_vars, a, b)
            keep = min(self.chunk, total - done)
            m1.append(o1[:keep])
            m2.append(o2[:keep])
            done += keep
        return jnp.concatenate(m1, 0), jnp.concatenate(m2, 0)

    def features_chunks(self, chunks, total: int) -> jnp.ndarray:
        feats = []
        done = 0
        for c in chunks:
            f = self._features(self.temporal_vars, c)
            keep = min(self.chunk, total - done)
            feats.append(f[:keep])
            done += keep
        return jnp.concatenate(feats, 0)

    def temporal_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        T = feats.shape[0]
        motions = []
        for s, e in self._chunks(T - 1):
            fp = self._pad_to(feats[s:e], self.chunk)
            fn = self._pad_to(feats[s + 1:e + 1], self.chunk)
            m = self._pair_motion(self.temporal_vars, fp, fn)
            motions.append(m[:e - s])
        motion = jnp.concatenate(motions, 0)
        zero = jnp.zeros_like(motion[:1])
        return jnp.concatenate([zero, motion], 0)

    def temporal_pair(self, frames1: jnp.ndarray, frames2: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Both views' temporal motions with HALF the dispatches.

        Each chunk batches the two views into one [2*chunk] forward (the
        nets are per-image, so this is exact); through a remote tunnel the
        dispatch count is the latency, so pairing the views matters more
        than the (already tiny) device time. Costs one extra compiled
        shape vs :meth:`temporal` ([2c] instead of [c]).
        """
        T = frames1.shape[0]
        c = self.chunk

        def pair_chunks(a, b, n):
            m1, m2 = [], []
            for s, e in self._chunks(n):
                fp = jnp.concatenate([self._pad_to(a[0][s:e], c),
                                      self._pad_to(b[0][s:e], c)], 0)
                fn = jnp.concatenate([self._pad_to(a[1][s:e], c),
                                      self._pad_to(b[1][s:e], c)], 0)
                m = self._pair_motion(self.temporal_vars, fp, fn)
                m1.append(m[:c][:e - s])
                m2.append(m[c:][:e - s])
            return jnp.concatenate(m1, 0), jnp.concatenate(m2, 0)

        feats1, feats2 = [], []
        for s, e in self._chunks(T):
            both = jnp.concatenate([self._pad_to(frames1[s:e], c),
                                    self._pad_to(frames2[s:e], c)], 0)
            f = self._features(self.temporal_vars, both)
            feats1.append(f[:c][:e - s])
            feats2.append(f[c:][:e - s])
        f1 = jnp.concatenate(feats1, 0)
        f2 = jnp.concatenate(feats2, 0)
        m1, m2 = pair_chunks((f1[:-1], f1[1:]), (f2[:-1], f2[1:]), T - 1)
        zero = jnp.zeros_like(m1[:1])
        return (jnp.concatenate([zero, m1], 0),
                jnp.concatenate([zero, m2], 0))

    def temporal(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames: [T, H, W, 3] -> motions [T, GH+1, GW+1, 2], zeros at t=0."""
        T = frames.shape[0]
        feats = []
        for s, e in self._chunks(T):
            f = self._features(self.temporal_vars,
                               self._pad_to(frames[s:e], self.chunk))
            feats.append(f[:e - s])
        feats = jnp.concatenate(feats, 0)
        motions = []
        for s, e in self._chunks(T - 1):
            fp = self._pad_to(feats[s:e], self.chunk)
            fn = self._pad_to(feats[s + 1:e + 1], self.chunk)
            m = self._pair_motion(self.temporal_vars, fp, fn)
            motions.append(m[:e - s])
        motion = jnp.concatenate(motions, 0)
        zero = jnp.zeros_like(motion[:1])
        return jnp.concatenate([zero, motion], 0)


def normalize_frames(frames_uint8: np.ndarray) -> np.ndarray:
    """uint8 [T,H,W,3] -> float32 [-1, 1] (reference: img/127.5 - 1)."""
    return frames_uint8.astype(np.float32) / 127.5 - 1.0
