"""Bicubic resize with torch ``F.interpolate`` semantics.

The reference uses torch bicubic in two places we must match:
- perceptual-loss overlap masks, align_corners=False (SpatialWarp/Codes/loss.py:31,38)
- dense smooth-path fields, align_corners=True (SmoothWarp/Codes/network.py:161-164).

torch's kernel is cubic convolution with a = -0.75 (jax.image.resize uses
a = -0.5, so it can't be reused). Because all shapes are static, the
separable interpolation is expressed as two small matmuls — out = Wy @ X @
Wx^T — which is the natural TPU formulation (MXU instead of gathers).
Out-of-range taps replicate the border, like torch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.ops.precision import HIGHEST

_A = -0.75


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        ((_A + 2.0) * ax - (_A + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0,
                 (((ax - 5.0) * ax + 8.0) * ax - 4.0) * _A,
                 0.0))
    return w


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    """[out_size, in_size] row-stochastic bicubic weight matrix."""
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * scale
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    M = np.zeros((out_size, in_size), np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac)
        np.add.at(M, (np.arange(out_size), idx), w)
    return M.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_size: Tuple[int, int],
                   align_corners: bool) -> jnp.ndarray:
    """x: [..., H, W, C] -> [..., out_h, out_w, C] (torch bicubic parity)."""
    out_h, out_w = out_size
    H, W = x.shape[-3], x.shape[-2]
    Wy = jnp.asarray(_resize_matrix(H, out_h, align_corners))
    Wx = jnp.asarray(_resize_matrix(W, out_w, align_corners))
    y = jnp.einsum("oh,...hwc->...owc", Wy, x, precision=HIGHEST)
    return jnp.einsum("pw,...owc->...opc", Wx, y, precision=HIGHEST)
