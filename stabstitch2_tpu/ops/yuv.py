"""BGR <-> YUV 4:2:0 (I420) conversion for transfer-thin downloads.

The composite download is the measured bottleneck on a tunneled chip
(~11-18 MB/s device->host while uploads run ~GB/s; see BENCHMARKS.md), and
the mp4 encoder converts to 4:2:0 anyway — so the compositor can emit I420
planes and halve the dominant transfer with zero quality loss relative to
what lands in the video file.

Conventions match OpenCV's ``COLOR_BGR2YUV_I420`` exactly (verified in
tests/test_geometry.py::TestYUV): limited-range BT.601 coefficients and
top-left 2x2 chroma decimation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bgr_to_yuv420(frames: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """float BGR [B, H, W, 3] (0..255, H and W even) -> (Y, U, V) uint8.

    Y: [B, H, W]; U/V: [B, H/2, W/2]. Limited-range BT.601 with top-left
    chroma decimation (cv2 COLOR_BGR2YUV_I420 semantics).
    """
    b = frames[..., 0]
    g = frames[..., 1]
    r = frames[..., 2]
    y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    bd, gd, rd = b[:, ::2, ::2], g[:, ::2, ::2], r[:, ::2, ::2]
    u = 128.0 - 0.148223 * rd - 0.290993 * gd + 0.439216 * bd
    v = 128.0 + 0.439216 * rd - 0.367788 * gd - 0.071427 * bd

    def q(x):
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)

    return q(y), q(u), q(v)


@jax.jit
def bgr_u8_to_yuv420_jit(frames_u8: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jitted uint8-BGR -> (Y, U, V) uint8 conversion, its OWN program.

    The window-gather composite emits uint8 BGR and chains this as a
    second dispatch: XLA fuses the in-program f32->yuv tail poorly
    downstream of a pallas_call (16.0 ms/chunk) while the two-program
    chain measures 13.0 ms — and quantize-then-convert is exactly what
    the bgr download path + the mp4 writer compute (BENCHMARKS round 4).
    """
    return bgr_to_yuv420(frames_u8.astype(jnp.float32))


def bgr_planes_to_yuv420(b: jnp.ndarray, g: jnp.ndarray, r: jnp.ndarray,
                         quantize_first: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PLANAR float BGR channels [B, H, W] x3 -> (Y, U, V) uint8.

    Same BT.601 arithmetic as :func:`bgr_to_yuv420`, but from separate
    channel planes: on TPU the interleaved [..., 3]-uint8 channel
    extraction lowers ~10x worse than the whole conversion (measured —
    the round-4 "chained" program's +3.4 ms/chunk was mostly that), while
    planar inputs convert at the HBM floor. ``quantize_first`` rounds the
    planes to uint8 BGR before converting — bit-identical to the chained
    bgr-u8 program + bgr_u8_to_yuv420_jit pair (and to the bgr download +
    mp4 writer chain).
    """
    if quantize_first:
        def q8(x):
            return jnp.clip(jnp.round(x), 0.0, 255.0).astype(
                jnp.uint8).astype(jnp.float32)

        b, g, r = q8(b), q8(g), q8(r)
    else:
        b, g, r = (x.astype(jnp.float32) for x in (b, g, r))
    y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
    bd, gd, rd = (c[:, ::2, ::2] for c in (b, g, r))
    u = 128.0 - 0.148223 * rd - 0.290993 * gd + 0.439216 * bd
    v = 128.0 + 0.439216 * rd - 0.367788 * gd - 0.071427 * bd

    def q(x):
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)

    return q(y), q(u), q(v)


@jax.jit
def bgr_planes_u8_to_yuv420_jit(b, g, r):
    """Jitted planar-uint8-BGR -> (Y, U, V), its own program (the chained
    two-program shape, planar flavor)."""
    return bgr_planes_to_yuv420(b, g, r, quantize_first=False)


def pack_i420(y, u, v) -> jnp.ndarray:
    """(Y [B,H,W], U, V [B,H/2,W/2]) -> packed I420 [B, H*3//2, W]."""
    B, H, W = y.shape
    flat = jnp.concatenate(
        [y.reshape(B, -1), u.reshape(B, -1), v.reshape(B, -1)], axis=1)
    return flat.reshape(B, H * 3 // 2, W)


def unpack_i420_u8(packed_u8: jnp.ndarray) -> jnp.ndarray:
    """Packed I420 [.., H*3//2, W] uint8 -> uint8 BGR [.., H, W, 3].

    The ONE quantized-unpack convention (round-then-uint8; i420_to_bgr
    clips internally) shared by the batch stitcher and the online mode —
    keep upload quantization identical across paths."""
    return jnp.round(i420_to_bgr(packed_u8)).astype(jnp.uint8)


def i420_to_bgr(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed I420 [B, H*3//2, W] (uint8/float) -> float BGR [B, H, W, 3].

    Inverse of the cv2 conventions above: limited-range BT.601, 2x nearest
    chroma upsampling. Used to unpack 1.5-byte/px uploads on device (the
    host->device link shares the relay's post-download throttled state, so
    upload bytes matter too; source frames are JPEG/mp4 4:2:0 anyway).
    """
    B, H15, W = packed.shape
    H = H15 * 2 // 3
    # planes are CONTIGUOUS in the packed buffer (cv2 I420 layout); split by
    # element count, not rows — when H % 4 != 0 the U plane ends mid-row and
    # a row-sliced split would silently misalign U/V (H=350: 41760 vs 42000)
    flat = packed.astype(jnp.float32).reshape(B, -1)
    n = H * W
    y = flat[:, :n].reshape(B, H, W)
    u = flat[:, n:n + n // 4].reshape(B, H // 2, W // 2)
    v = flat[:, n + n // 4:].reshape(B, H // 2, W // 2)
    up = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
    u = up(u) - 128.0
    v = up(v) - 128.0
    c = (y - 16.0) * 1.164383
    b = c + 2.017232 * u
    g = c - 0.391762 * u - 0.812968 * v
    r = c + 1.596027 * v
    return jnp.clip(jnp.stack([b, g, r], -1), 0.0, 255.0)
