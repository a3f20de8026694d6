"""Pallas TPU kernel for the packed-patch warp gather (the composite hot op).

Parity target: the single [B, HW, 4] int32 gather inside
``ops.interp.bilinear_sample_patch_u8`` (itself the one-gather form of the
reference's manual bilinear sampler, torch_homo_transform.py:50-125). XLA
lowers that take_along_axis as an HBM gather at ~9 ns/lookup; at canvas
resolution it is the single hottest device cost in the framework (~62% of
per-video device time, BENCHMARKS.md round 3b).

Kernel design (probe: examples/probe_pallas_gather2.py — measured on chip
round 4: 3.24 ms vs 34.76 ms XLA at [16]x384x640, EXACT match, 10.7x):

- grid (B, OH/8, OW/128); each step emits an (8, 128) canvas block's four
  corner planes (y0x0, y0x1, y1x0, y1x1) as int32.
- Mosaic's ``tpu.dynamic_gather`` needs the source to fit ONE vreg along
  the gather dim (<=128 lanes; capability map:
  examples/probe_mosaic_gather.py), so the source window for a block is
  brought in by DATA-DEPENDENT BlockSpec index maps
  (PrefetchScalarGridSpec): per-block row/col window origins — computed
  outside with cheap jnp block-min reductions — select eight (8, 128)
  tiles (4 row tiles x 2 column tiles = a 32x256 window) of the padded
  packed image. No in-kernel dynamic slicing.
- per window row r (static 32-iteration loop), ONE stacked (32, 128) lane
  gather covers both column halves for both x0 and x0+1; row selection is
  compare/select accumulation against the block-local y0.

Window invariants (violations are detected, clamped, and reported — see
``bilinear_sample_patch_u8_pallas``):
- block source-row span (8-quantized origin) <= ROW_SPAN rows, i.e. y0+1
  fits the 32-row window.
- block source-col span (128-quantized origin) <= 254, i.e. x0+1 fits the
  256-col double window.

STATUS — OPT-IN, not the production default (round-4 verification): the
row budget is consumed not just by the canvas->source y-slope (~<=1) but
by SHEAR — d(src_y)/d(canvas_x) — times the 128-lane block width, and
real TPS meshes (rotation + local compression + extrapolation overshoot)
measured yspan p99=75 / max=113 rows and xspan max=287 cols on a real
stitch (examples/diag_gather_violation.py), corrupting 11% of output
pixels under the clamp. The XLA packed-patch gather stays the default;
this kernel is a measured 10.7x opt-in for low-shear warps until the
robust windowing (support-masked, shear-following origins, bounded exact
repair) replaces it.

The kernel is inference-only (no VJP) and exact: it returns the identical
int32 corner planes the XLA gather produces, so the surrounding weight
algebra (shared via ops.interp._patch_weights_idx/_combine_patch_u8) makes
the full sampler bit-identical to ``bilinear_sample_patch_u8`` wherever
the window invariants hold.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8        # canvas block height
COLS = 128      # canvas block width (one vreg of lanes)
RWIN = 8        # source row-window tile height (= origin quantization; 8
                # keeps the quantization waste at <=7 rows of the window)
NTILES = 4      # row tiles per window -> 32-row window
RLOOP = NTILES * RWIN        # static row iterations (covers y0+1 too)
ROW_SPAN = RLOOP - 2         # max block-local y0 (y0+1 must also fit)


def _kernel(rorg_ref, corg_ref, w0l_ref, w1l_ref, w2l_ref, w3l_ref,
            w0r_ref, w1r_ref, w2r_ref, w3r_ref, y0_ref, x0_ref, o_ref):
    del rorg_ref, corg_ref  # consumed by the index maps
    left = (w0l_ref, w1l_ref, w2l_ref, w3l_ref)
    right = (w0r_ref, w1r_ref, w2r_ref, w3r_ref)
    y0 = y0_ref[0]                                  # (ROWS, COLS) int32
    x0 = x0_ref[0]                                  # window-local coords
    x1 = x0 + 1
    idx = jnp.concatenate([
        jnp.clip(x0, 0, COLS - 1),
        jnp.clip(x0 - COLS, 0, COLS - 1),
        jnp.clip(x1, 0, COLS - 1),
        jnp.clip(x1 - COLS, 0, COLS - 1),
    ], axis=0)                                      # (4*ROWS, COLS)
    in_a0 = x0 < COLS
    in_a1 = x1 < COLS
    acc_a = jnp.zeros_like(x0)   # (y0, x0)
    acc_c = jnp.zeros_like(x0)   # (y0, x1)
    acc_b = jnp.zeros_like(x0)   # (y1, x0)
    acc_d = jnp.zeros_like(x0)   # (y1, x1)
    for r in range(RLOOP):
        k, rr = r // RWIN, r % RWIN
        row_a = left[k][0, rr:rr + 1, :]
        row_b = right[k][0, rr:rr + 1, :]
        src = jnp.concatenate([
            jnp.broadcast_to(row_a, (ROWS, COLS)),
            jnp.broadcast_to(row_b, (ROWS, COLS)),
            jnp.broadcast_to(row_a, (ROWS, COLS)),
            jnp.broadcast_to(row_b, (ROWS, COLS)),
        ], axis=0)
        g = jnp.take_along_axis(src, idx, axis=1)   # ONE (32,128) gather
        g0 = jnp.where(in_a0, g[0:ROWS], g[ROWS:2 * ROWS])
        g1 = jnp.where(in_a1, g[2 * ROWS:3 * ROWS], g[3 * ROWS:])
        mt = y0 == r
        mb = y0 == r - 1
        acc_a = jnp.where(mt, g0, acc_a)
        acc_c = jnp.where(mt, g1, acc_c)
        acc_b = jnp.where(mb, g0, acc_b)
        acc_d = jnp.where(mb, g1, acc_d)
    o_ref[0, 0] = acc_a
    o_ref[0, 1] = acc_c
    o_ref[0, 2] = acc_b
    o_ref[0, 3] = acc_d


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _patch_gather_planes(padded: jnp.ndarray, y0i: jnp.ndarray,
                         x0i: jnp.ndarray, interpret: bool = False):
    """padded: [B, HP, WP] int32 (packed, edge+zero padded); y0i/x0i:
    [B, OHp, OWp] CLAMPED absolute corner coords (OHp % 8 == 0,
    OWp % 128 == 0). Returns ([B, 4, OHp, OWp] int32 planes in (a, c, b,
    d) = (y0x0, y0x1, y1x0, y1x1) order, violated bool scalar)."""
    B, HP, WP = padded.shape
    _, OHp, OWp = y0i.shape
    nrb, ncb = OHp // ROWS, OWp // COLS

    yb = y0i.reshape(B, nrb, ROWS, ncb, COLS)
    xb = x0i.reshape(B, nrb, ROWS, ncb, COLS)
    rorg = jnp.clip(yb.min(axis=(2, 4)) // RWIN, 0,
                    HP // RWIN - NTILES).astype(jnp.int32)
    corg = jnp.clip(xb.min(axis=(2, 4)) // COLS, 0,
                    WP // COLS - 2).astype(jnp.int32)
    # window-invariant check: the kernel clamps out-of-window locals (a
    # violated pixel samples the nearest in-window row/col instead of
    # corrupting or zeroing), and the flag reports that it happened
    yspan = yb.max(axis=(2, 4)) - rorg * RWIN
    xspan = xb.max(axis=(2, 4)) - corg * COLS
    violated = jnp.any(yspan > ROW_SPAN) | jnp.any(xspan > 2 * COLS - 2)

    def expand(v):
        return jnp.repeat(jnp.repeat(v, ROWS, axis=1), COLS, axis=2)

    y0l = jnp.clip(y0i - expand(rorg * RWIN), 0, ROW_SPAN)
    x0l = jnp.clip(x0i - expand(corg * COLS), 0, 2 * COLS - 2)

    def win_spec(k, right):
        return pl.BlockSpec(
            (1, RWIN, COLS),
            lambda b, i, j, r, c, k=k, right=right: (b, r[b, i, j] + k,
                                                     c[b, i, j] + right),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nrb, ncb),
        in_specs=(
            [win_spec(k, 0) for k in range(NTILES)]
            + [win_spec(k, 1) for k in range(NTILES)]
            + [pl.BlockSpec((1, ROWS, COLS),
                            lambda b, i, j, r, c: (b, i, j),
                            memory_space=pltpu.VMEM)] * 2
        ),
        out_specs=pl.BlockSpec((1, 4, ROWS, COLS),
                               lambda b, i, j, r, c: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
    )
    planes = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, OHp, OWp), jnp.int32),
        interpret=interpret,
    )(rorg, corg, *([padded] * (2 * NTILES)), y0l, x0l)
    return planes, violated


def bilinear_sample_patch_u8_pallas(im: jnp.ndarray, x: jnp.ndarray,
                                    y: jnp.ndarray,
                                    out_hw: Tuple[int, int],
                                    interpret: bool | None = None):
    """Kernel-backed :func:`ops.interp.bilinear_sample_patch_u8`.

    im: [B, H, W, 3] uint8; x, y: [B, N] normalized coords laid out as an
    (out_h, out_w) raster (N == out_h*out_w — the kernel tiles the output
    spatially, so it needs the 2-D structure the flat samplers don't).
    Returns ([B, N, 3] float samples in x's dtype, violated bool scalar).
    ``violated`` reports any window-invariant breach (extreme local TPS
    compression); breached pixels are sampled from the nearest in-window
    source row/col — a bounded, graceful degradation that realistic
    meshes never trigger (asserted false in the parity tests).
    """
    from stabstitch2_tpu.ops.interp import (
        _combine_patch_u8,
        _patch_weights_idx,
        pack_bgr_u8,
    )

    B, H, W, C = im.shape
    oh, ow = out_hw
    assert C == 3 and im.dtype == jnp.uint8, (im.shape, im.dtype)
    assert x.shape[-1] == oh * ow, (x.shape, out_hw)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    compute_dtype = x.dtype

    packed = pack_bgr_u8(im)
    # +1 edge row/col for the patch neighbors (same as the XLA path), then
    # zero-pad to the window grid: rows to a multiple of RWIN, cols to a
    # multiple of COLS with one spare COLS block so corg+1 always indexes
    # a real block
    HP = max(_round_up(H + 1, RWIN), NTILES * RWIN)
    WP = _round_up(W + 1, COLS) + COLS
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)), mode="edge")
    padded = jnp.pad(padded, ((0, 0), (0, HP - (H + 1)), (0, WP - (W + 1))))

    wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x, y, H, W)
    OHp, OWp = _round_up(oh, ROWS), _round_up(ow, COLS)
    y2 = y0i.reshape(B, oh, ow)
    x2 = x0i.reshape(B, oh, ow)
    if (OHp, OWp) != (oh, ow):
        # edge-replicated coords keep the padding blocks' windows tight
        y2 = jnp.pad(y2, ((0, 0), (0, OHp - oh), (0, OWp - ow)), mode="edge")
        x2 = jnp.pad(x2, ((0, 0), (0, OHp - oh), (0, OWp - ow)), mode="edge")

    planes, violated = _patch_gather_planes(padded, y2, x2,
                                            interpret=interpret)
    planes = planes[:, :, :oh, :ow].reshape(B, 4, oh * ow)
    out = _combine_patch_u8(planes[:, 0], planes[:, 2], planes[:, 1],
                            planes[:, 3], wa, wb, wc, wd, compute_dtype)
    return out, violated
