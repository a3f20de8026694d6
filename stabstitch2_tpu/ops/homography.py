"""Homography spatial transformer.

Parity target: ``transformer`` in
Full_model_inference/Codes/utils/torch_homo_transform.py:147-184 —
a normalized [-1,1] output grid (linspace including endpoints) is pushed
through theta, perspective-divided with the reference's small-denominator
guard, and bilinearly sampled with :func:`bilinear_sample` semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stabstitch2_tpu.ops.interp import bilinear_sample
from stabstitch2_tpu.ops.precision import HIGHEST


def normalized_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous normalized grid [3, H*W]: rows (x, y, 1), x/y in [-1,1]."""
    x_t = jnp.tile(jnp.linspace(-1.0, 1.0, width, dtype=dtype)[None, :], (height, 1))
    y_t = jnp.tile(jnp.linspace(-1.0, 1.0, height, dtype=dtype)[:, None], (1, width))
    ones = jnp.ones((height * width,), dtype)
    return jnp.stack([x_t.reshape(-1), y_t.reshape(-1), ones], axis=0)


def homo_sample_coords(theta: jnp.ndarray, out_size: Tuple[int, int]
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map the output grid through theta. theta: [B,3,3] (normalized coords).

    Returns (x_s, y_s) each [B, H*W]. Implements the reference's denominator
    guard: add 1e-6 wherever |t| < 1e-7 (torch_homo_transform.py:166-170).
    """
    out_h, out_w = out_size
    grid = normalized_grid(out_h, out_w, theta.dtype)  # [3, HW]
    T_g = jnp.einsum("bij,jn->bin", theta, grid, precision=HIGHEST)  # [B, 3, HW]
    x_s, y_s, t_s = T_g[:, 0], T_g[:, 1], T_g[:, 2]
    small = 1e-7
    t_s = t_s + 1e-6 * (1.0 - (jnp.abs(t_s) >= small).astype(t_s.dtype))
    return x_s / t_s, y_s / t_s


def homo_warp(im: jnp.ndarray, theta: jnp.ndarray,
              out_size: Tuple[int, int]) -> jnp.ndarray:
    """Warp NHWC image(s) by a normalized-coordinate homography.

    im: [B, H, W, C]; theta: [B, 3, 3]. Returns [B, out_h, out_w, C].
    """
    B, _, _, C = im.shape
    out_h, out_w = out_size
    x_s, y_s = homo_sample_coords(theta, out_size)
    sampled = bilinear_sample(im, x_s, y_s)  # [B, HW, C]
    return sampled.reshape(B, out_h, out_w, C)


def homo_warp_with_mask(im: jnp.ndarray, theta: jnp.ndarray,
                        out_size: Tuple[int, int]
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Like :func:`homo_warp` but also returns the coverage mask [B, oh, ow].

    The mask equals warping a concatenated ones-channel (the reference's
    idiom, e.g. SpatialWarp/Codes/network.py:131-135) but is computed
    arithmetically from the sample coordinates — TPU gathers are
    per-lookup-bound (BENCHMARKS.md round 3b), so skipping the mask-plane
    gather saves its lookups; images stay 3-channel."""
    from stabstitch2_tpu.ops.interp import bilinear_mask

    B, H, W, _ = im.shape
    out_h, out_w = out_size
    x_s, y_s = homo_sample_coords(theta, out_size)
    sampled = bilinear_sample(im, x_s, y_s)
    m = bilinear_mask(H, W, x_s, y_s)
    return (sampled.reshape(B, out_h, out_w, im.shape[-1]),
            m.reshape(B, out_h, out_w))


def normalize_homography(H: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Conjugate a pixel-coordinate homography into normalized coordinates.

    theta = M^{-1} H M with M = diag-ish pixel<->[-1,1] map (the reference
    builds M/M^-1 inline, e.g. SpatialWarp/Codes/network.py:114-129).
    H: [B,3,3].
    """
    w2, h2 = float(width) / 2.0, float(height) / 2.0
    M = jnp.array([[w2, 0.0, w2], [0.0, h2, h2], [0.0, 0.0, 1.0]], H.dtype)
    M_inv = jnp.array([[1.0 / w2, 0.0, -1.0], [0.0, 1.0 / h2, -1.0],
                       [0.0, 0.0, 1.0]], H.dtype)
    return jnp.einsum("ij,bjk,kl->bil", M_inv, H, M, precision=HIGHEST)
