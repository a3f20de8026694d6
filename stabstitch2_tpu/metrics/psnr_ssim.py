"""PSNR / SSIM with scikit-image 0.15 semantics.

The reference pins skimage 0.15 for ``compare_psnr`` / ``compare_ssim``
(test_metric_ssd.py:519-524, multichannel=True, data_range=255). That API
is long dead; this is a direct reimplementation of its formulas:
- PSNR: 10*log10(data_range^2 / mse) over the full image.
- SSIM: 7x7 UNIFORM window (no gaussian weighting by default), sample
  covariance normalization N/(N-1), C1=(0.01*L)^2, C2=(0.03*L)^2, border
  crop of (win-1)//2, channel-averaged for multichannel.
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         data_range: float = 255.0) -> jnp.ndarray:
    """[..., H, W, C] pair -> scalar PSNR in dB."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean over win x win windows, 'valid' region only. x: [H, W].

    Implemented as separable sliding-slice sums, NOT an integral image: a
    float32 double-cumsum of x*x reaches ~1e10 at 360x480 (ulp ~1e3), and
    the 4-corner subtraction then cancels catastrophically — the window
    variance in flat regions (O(1..25)) would be wrong by >50%. Slice sums
    only ever accumulate win^2 local values, keeping the error at ~1e-2."""
    H, W = x.shape
    rows = sum(x[i:H - win + 1 + i] for i in range(win))
    cols = sum(rows[:, j:W - win + 1 + j] for j in range(win))
    return cols / (win * win)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 255.0,
         win_size: int = 7) -> jnp.ndarray:
    """Channel-averaged SSIM. img*: [H, W, C] (or [H, W]).

    skimage crops (win-1)//2 borders of the per-pixel map before averaging;
    computing on 'valid' windows directly is identical.
    """
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    def channel(xc, yc):
        ux = _uniform_filter_valid(xc, win_size)
        uy = _uniform_filter_valid(yc, win_size)
        uxx = _uniform_filter_valid(xc * xc, win_size)
        uyy = _uniform_filter_valid(yc * yc, win_size)
        uxy = _uniform_filter_valid(xc * yc, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1 = 2.0 * ux * uy + C1
        A2 = 2.0 * vxy + C2
        B1 = ux * ux + uy * uy + C1
        B2 = vx + vy + C2
        return jnp.mean(A1 * A2 / (B1 * B2))

    vals = [channel(x[..., c], y[..., c]) for c in range(x.shape[-1])]
    return jnp.mean(jnp.stack(vals))
