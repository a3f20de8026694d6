"""Bilinear resampling with the reference's exact arithmetic.

Two samplers:

- :func:`bilinear_sample` — parity target is the hand-written ``_interpolate``
  shared by the reference's homography and TPS transformers
  (Full_model_inference/Codes/utils/torch_homo_transform.py:50-125).
  Normalized coords map to pixels as ``x_px = (x+1) * W / 2`` (note: W, not
  W-1), corner indices are clamped to the image bounds, and weights are
  computed from the *clamped* corner coordinates against the *unclamped*
  sample position. Consequence (and the behavior the NORMAL warp mode relies
  on): once both corners clamp to the same index the four weights sum to
  zero, so out-of-image samples come out exactly 0 — without a grid_sample
  style half-pixel black seam at the border.

- :func:`grid_sample_align_corners` — parity target is
  ``F.grid_sample(..., align_corners=True)`` (the reference's FAST mode,
  torch_tps_transform.py:158-162): ``x_px = (x+1) * (W-1) / 2``, zero
  padding for out-of-range corners.

Images are NHWC. Coordinates are [B, N] flat sample positions.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_pixels(flat_im: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """flat_im: [B, H*W, C]; idx: [B, N] int32 -> [B, N, C]."""
    return jnp.take_along_axis(flat_im, idx[..., None], axis=1)


def bilinear_sample(im: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``im`` at normalized coords (x, y) with reference semantics.

    im: [B, H, W, C]; x, y: [B, N] in [-1, 1] (values outside produce 0).
    Returns [B, N, C].
    """
    B, H, W, C = im.shape
    compute_dtype = x.dtype

    xf = (x + 1.0) * (W / 2.0)
    yf = (y + 1.0) * (H / 2.0)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x0c = jnp.clip(x0, 0.0, W - 1)
    x1c = jnp.clip(x0 + 1.0, 0.0, W - 1)
    y0c = jnp.clip(y0, 0.0, H - 1)
    y1c = jnp.clip(y0 + 1.0, 0.0, H - 1)

    # Weights from clamped corners vs unclamped position — this is what makes
    # fully-out-of-range samples sum to zero (torch_homo_transform.py:119-123).
    wa = (x1c - xf) * (y1c - yf)
    wb = (x1c - xf) * (yf - y0c)
    wc = (xf - x0c) * (y1c - yf)
    wd = (xf - x0c) * (yf - y0c)

    x0i = x0c.astype(jnp.int32)
    x1i = x1c.astype(jnp.int32)
    y0i = y0c.astype(jnp.int32)
    y1i = y1c.astype(jnp.int32)

    flat = im.reshape(B, H * W, C)
    Ia = _gather_pixels(flat, y0i * W + x0i)
    Ib = _gather_pixels(flat, y1i * W + x0i)
    Ic = _gather_pixels(flat, y0i * W + x1i)
    Id = _gather_pixels(flat, y1i * W + x1i)

    out = (wa[..., None] * Ia + wb[..., None] * Ib
           + wc[..., None] * Ic + wd[..., None] * Id)
    return out.astype(compute_dtype)


def _patch_weights_idx(x: jnp.ndarray, y: jnp.ndarray, H: int, W: int):
    """Shared corner/weight algebra of the packed-patch samplers.

    Returns (wa, wb, wc, wd, y0i, x0i): the reference's four bilinear
    weights (with the low-side cancellation made explicit — see
    :func:`bilinear_sample_patch_u8`) and the CLAMPED top-left corner
    indices the single patch gather uses. Split out so the XLA gather
    path and the Pallas window-gather kernel (ops/pallas_gather.py) are
    numerically the same program around the gather.
    """
    compute_dtype = x.dtype
    xf = (x + 1.0) * (W / 2.0)
    yf = (y + 1.0) * (H / 2.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x0c = jnp.clip(x0, 0.0, W - 1)
    x1c = jnp.clip(x0 + 1.0, 0.0, W - 1)
    y0c = jnp.clip(y0, 0.0, H - 1)
    y1c = jnp.clip(y0 + 1.0, 0.0, H - 1)

    # reference weight algebra (bilinear_sample), with the low-side
    # cancellation made explicit so the patch's (col+1, row+1) neighbors
    # never leak into results the reference derives from clamped corners
    inside = (x0 >= 0.0) & (y0 >= 0.0)  # False for NaN too
    zero = jnp.zeros((), compute_dtype)
    wa = jnp.where(inside, (x1c - xf) * (y1c - yf), zero)
    wb = jnp.where(inside, (x1c - xf) * (yf - y0c), zero)
    wc = jnp.where(inside, (xf - x0c) * (y1c - yf), zero)
    wd = jnp.where(inside, (xf - x0c) * (yf - y0c), zero)
    return wa, wb, wc, wd, y0c.astype(jnp.int32), x0c.astype(jnp.int32)


def _combine_patch_u8(ga, gb, gc, gd, wa, wb, wc, wd, compute_dtype):
    """Unpack 4 packed-BGR int32 corner planes and apply the weights.

    Corner order follows the reference (torch_homo_transform.py:110-123):
    a=(y0,x0), b=(y1,x0), c=(y0,x1), d=(y1,x1). Same accumulation ORDER
    as bilinear_sample so the only cross-path difference is FMA
    contraction, not reassociation.
    """
    def unpack(v):
        return jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF],
                         axis=-1).astype(compute_dtype)

    return (wa[..., None] * unpack(ga)
            + wb[..., None] * unpack(gb)
            + wc[..., None] * unpack(gc)
            + wd[..., None] * unpack(gd))


def _combine_patch_u8_planes(ga, gb, gc, gd, wa, wb, wc, wd, compute_dtype):
    """PLANAR variant of :func:`_combine_patch_u8`: per-channel arrays.

    Returns (B, G, R) planes in the weights' broadcast shape with NO
    channel stack/interleave — the yuv420 composite stays planar end to
    end (interleaved uint8 channel extraction lowers ~10x worse than the
    whole conversion on TPU; BENCHMARKS round 5). Same corner order and
    accumulation order as _combine_patch_u8.
    """
    def ch(shift):
        ua = ((ga >> shift) & 0xFF).astype(compute_dtype)
        ub = ((gb >> shift) & 0xFF).astype(compute_dtype)
        uc = ((gc >> shift) & 0xFF).astype(compute_dtype)
        ud = ((gd >> shift) & 0xFF).astype(compute_dtype)
        return wa * ua + wb * ub + wc * uc + wd * ud

    return ch(0), ch(8), ch(16)


def pack_bgr_u8(im: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> [B, H, W] int32 with B|G<<8|R<<16 packing."""
    return (im[..., 0].astype(jnp.int32)
            | (im[..., 1].astype(jnp.int32) << 8)
            | (im[..., 2].astype(jnp.int32) << 16))


def bilinear_sample_patch_u8(im: jnp.ndarray, x: jnp.ndarray,
                             y: jnp.ndarray) -> jnp.ndarray:
    """:func:`bilinear_sample` for uint8 images with ONE gather instead of 4.

    TPU gather cost is per-LOOKUP, not per-byte, and flat for trailing
    dims up to ~32 bytes (measured: [16,HW,3..8]xf32 all ~23 ms at 208k
    indices/image, [16,HW] 2D gathers no cheaper, 12+ channels 3x worse
    — BENCHMARKS.md round-3b). So the composite's four corner gathers
    (~94 ms/chunk, the single hottest cost in the framework) collapse to
    one: pack BGR into an int32 per pixel, build the 2x2 neighbor patch
    as 4 int32 channels with edge padding, gather [B,HW,4] once at
    (y0,x0), and unpack with shifts.

    Output equals :func:`bilinear_sample` to FMA-contraction rounding
    (<= 2^-12 at 0..255 pixel scale; XLA fuses the two program shapes
    differently, so exact bit-equality across them is not attainable):
    on the high side the edge pad makes clamped corners coincide, so the
    reference's weight algebra is reproduced verbatim; on the low side
    (x0 < 0 or y0 < 0) the reference's contributions cancel pairwise to
    ~0 and this path writes an exact 0 by zeroing the weights. NaN
    coordinates: the reference propagates NaN, this returns 0 (the
    zeroing comparison is False for NaN) — degenerate-mesh frames come
    out black instead of NaN.

    im: [B, H, W, 3] uint8; x, y: [B, N] normalized. Returns [B, N, 3]
    in x's dtype.
    """
    B, H, W, C = im.shape
    assert C == 3 and im.dtype == jnp.uint8, (im.shape, im.dtype)
    compute_dtype = x.dtype

    packed = pack_bgr_u8(im)                                # [B, H, W]
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)), mode="edge")
    patch = jnp.stack([padded[:, :H, :W], padded[:, :H, 1:],
                       padded[:, 1:, :W], padded[:, 1:, 1:]],
                      axis=-1).reshape(B, H * W, 4)

    wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x, y, H, W)
    idx = y0i * W + x0i
    g = jnp.take_along_axis(patch, idx[..., None], axis=1)  # [B, N, 4]
    # patch channel order is (y0x0, y0x1, y1x0, y1x1) -> (a, c, b, d)
    return _combine_patch_u8(g[..., 0], g[..., 2], g[..., 1], g[..., 3],
                             wa, wb, wc, wd, compute_dtype)


def bilinear_mask(im_h: int, im_w: int, x: jnp.ndarray,
                  y: jnp.ndarray) -> jnp.ndarray:
    """Warped all-ones-channel value WITHOUT a gather (NORMAL semantics).

    The reference warps ``concat([img, ones])`` and reads the last channel
    as the coverage mask. Because the ones-plane is 1 at every (clamped)
    corner, the sampled value is exactly the sum of the four bilinear
    weights — pure arithmetic. On TPU, gather cost is per-LOOKUP (flat in
    trailing width up to ~32 bytes; BENCHMARKS.md round 3b), so deriving
    the mask arithmetically saves the mask-plane gathers outright — a real
    but bounded win, not the ~1000x once claimed in round 2 (retracted:
    that figure was an enqueue-rate measurement artifact).
    """
    W, H = im_w, im_h
    xf = (x + 1.0) * (W / 2.0)
    yf = (y + 1.0) * (H / 2.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x0c = jnp.clip(x0, 0.0, W - 1)
    x1c = jnp.clip(x0 + 1.0, 0.0, W - 1)
    y0c = jnp.clip(y0, 0.0, H - 1)
    y1c = jnp.clip(y0 + 1.0, 0.0, H - 1)
    return ((x1c - xf) * (y1c - yf) + (x1c - xf) * (yf - y0c)
            + (xf - x0c) * (y1c - yf) + (xf - x0c) * (yf - y0c))


def grid_sample_mask_align_corners(im_h: int, im_w: int, x: jnp.ndarray,
                                   y: jnp.ndarray) -> jnp.ndarray:
    """FAST-mode coverage mask without a gather (valid-corner weight sum)."""
    W, H = im_w, im_h
    xf = (x + 1.0) * ((W - 1) / 2.0)
    yf = (y + 1.0) * ((H - 1) / 2.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    total = jnp.zeros_like(xf)
    for ix, iy, w in (
            (x0, y0, (x1 - xf) * (y1 - yf)),
            (x0, y1, (x1 - xf) * (yf - y0)),
            (x1, y0, (xf - x0) * (y1 - yf)),
            (x1, y1, (xf - x0) * (yf - y0))):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        total = total + jnp.where(valid, w, 0.0)
    return total


def grid_sample_align_corners(im: jnp.ndarray, x: jnp.ndarray,
                              y: jnp.ndarray) -> jnp.ndarray:
    """``F.grid_sample(align_corners=True, padding_mode='zeros')`` semantics.

    im: [B, H, W, C]; x, y: [B, N] normalized. Returns [B, N, C].
    """
    B, H, W, C = im.shape

    xf = (x + 1.0) * ((W - 1) / 2.0)
    yf = (y + 1.0) * ((H - 1) / 2.0)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Weights from the *unclamped* corners; out-of-range corners contribute 0.
    wa = (x1 - xf) * (y1 - yf)
    wb = (x1 - xf) * (yf - y0)
    wc = (xf - x0) * (y1 - yf)
    wd = (xf - x0) * (yf - y0)

    def corner(ix, iy, w):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        vals = _gather_pixels(im.reshape(B, H * W, C), iyc * W + ixc)
        w = jnp.where(valid, w, 0.0)
        return w[..., None] * vals

    out = (corner(x0, y0, wa) + corner(x0, y1, wb)
           + corner(x1, y0, wc) + corner(x1, y1, wd))
    return out
