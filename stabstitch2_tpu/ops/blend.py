"""Panorama fusion operators.

Parity targets (inline helpers in the reference drivers):
- AVERAGE fusion: intensity-proportional mix
  ``I1*(I1/(I1+I2+eps)) + I2*(I2/(I1+I2+eps))`` (test_online_ssd.py:142).
- LINEAR fusion: ``linear_blender`` (test_online_ssd.py:34-58) — a seam mask
  built by projecting overlap pixels onto the center1->center2 axis,
  feathered with a 21x21 sigma=20 Gaussian blur.

The reference's blender picks nonzero pixel centers with ``torch.nonzero``
(data-dependent shapes); here everything is mask-weighted arithmetic, so
the whole fusion jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def average_fusion(img1: jnp.ndarray, img2: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    """Intensity-proportional fusion of two warped frames [..., H, W, C]."""
    total = img1 + img2 + eps
    return img1 * (img1 / total) + img2 * (img2 / total)


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int = 21,
                  sigma: float = 20.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect padding (torchvision semantics).

    x: [B, H, W, C].
    """
    k = jnp.asarray(_gaussian_kernel1d(ksize, sigma))
    pad = ksize // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # depthwise separable: rows then cols via conv_general_dilated
    kh = k.reshape(ksize, 1, 1, 1)
    kh = jnp.tile(kh, (1, 1, 1, C))
    xp = jax.lax.conv_general_dilated(
        xp, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    kw = k.reshape(1, ksize, 1, 1)
    kw = jnp.tile(kw, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        xp, kw, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _masked_center(mask: jnp.ndarray) -> jnp.ndarray:
    """Mean (row, col) of nonzero pixels. mask: [H, W] -> [2]."""
    H, W = mask.shape
    rows = jnp.arange(H, dtype=mask.dtype)[:, None]
    cols = jnp.arange(W, dtype=mask.dtype)[None, :]
    total = jnp.sum(mask) + 1e-8
    return jnp.stack([jnp.sum(mask * rows), jnp.sum(mask * cols)]) / total


def linear_blend_mask(ref_m: jnp.ndarray, tgt_m: jnp.ndarray,
                      ksize: int = 21, sigma: float = 20.0) -> jnp.ndarray:
    """Seam weight mask for the reference view. ref_m/tgt_m: [H, W] in [0,1].

    Returns mask1 [H, W]; blend as ``ref*mask1 + tgt*(1-mask1)*tgt_m``.
    """
    center1 = _masked_center(ref_m)
    center2 = _masked_center(tgt_m)
    vec = center2 - center1  # (dr, dc)

    ovl = jnp.round(ref_m * tgt_m)
    ref_only = ref_m - ovl

    H, W = ref_m.shape
    rows = jnp.arange(H, dtype=ref_m.dtype)[:, None]
    cols = jnp.arange(W, dtype=ref_m.dtype)[None, :]
    proj = (rows - center1[0]) * vec[0] + (cols - center1[1]) * vec[1]
    big = jnp.asarray(jnp.finfo(ref_m.dtype).max, ref_m.dtype)
    pmin = jnp.min(jnp.where(ovl > 0, proj, big))
    pmax = jnp.max(jnp.where(ovl > 0, proj, -big))
    ovl_ramp = (proj - pmin) / (pmax - pmin + 1e-3)
    ovl_mask = jnp.where(ovl > 0, ovl_ramp, 0.0)

    seam = ref_only + (1.0 - ovl_mask) * ref_m
    blurred = gaussian_blur(seam[None, :, :, None], ksize, sigma)[0, :, :, 0]
    return jnp.clip(blurred * ref_m + ref_only, 0.0, 1.0)


def linear_fusion(ref: jnp.ndarray, tgt: jnp.ndarray, ref_m: jnp.ndarray,
                  tgt_m: jnp.ndarray) -> jnp.ndarray:
    """Full LINEAR blend. ref/tgt: [H, W, C]; ref_m/tgt_m: [H, W]."""
    mask1 = linear_blend_mask(ref_m, tgt_m)
    mask2 = (1.0 - mask1) * tgt_m
    return ref * mask1[..., None] + tgt * mask2[..., None]
