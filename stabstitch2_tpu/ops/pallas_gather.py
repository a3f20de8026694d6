"""Pallas TPU kernel for the packed-patch warp gather (the composite hot op).

Parity target: the single [B, HW, 4] int32 gather inside
``ops.interp.bilinear_sample_patch_u8`` (itself the one-gather form of the
reference's manual bilinear sampler, torch_homo_transform.py:50-125). XLA
lowers that take_along_axis as an HBM gather at ~9 ns/lookup; at canvas
resolution it is the single hottest device cost in the framework (~62% of
per-video device time, BENCHMARKS.md round 3b).

Kernel design v2 (round 4; v1 probe: examples/probe_pallas_gather2.py —
3.24 ms vs 34.76 ms XLA at [16]x384x640, but its fixed 32x256 window broke
on real meshes, BENCHMARKS.md round 4):

- grid (B, OH/8, OW/128); each step emits an (8, 128) canvas block's four
  corner planes (y0x0, y0x1, y1x0, y1x1) as int32.
- Mosaic's ``tpu.dynamic_gather`` needs the source to fit ONE vreg along
  the gather dim (<=128 lanes; capability map:
  examples/probe_mosaic_gather.py), so the source window for a block is
  brought in by DATA-DEPENDENT BlockSpec index maps
  (PrefetchScalarGridSpec): per-block row/col window origins select
  NT x NCT (8, 128) tiles of the padded packed image — a generous
  128-row x 384-col window at the defaults, sized so real smooth meshes
  NEVER overflow it (measured span coverage:
  examples/diag_gather_violation.py).
- Window origins are SUPPORT-MASKED: only pixels that can produce nonzero
  output (positive bilinear weight sum) constrain the block's window, so
  edge-clamped dead pixels stop inflating the span (v1 used unmasked
  mins — the main reason its 32-row budget overflowed).
- A per-block DYNAMIC trip count (scalar-prefetched) processes only the
  row tiles the block's live span actually needs — mean live span is
  ~26 rows, so the average block runs ~4 of the 16 fetched tiles and the
  generous window costs compute like v1's small one (fetching the unused
  tiles is pure HBM->VMEM traffic, ~0.2 ms/chunk at production shapes).
- per processed window row r (RWIN-unrolled under ``pl.when``), ONE
  stacked (2*NCT*8, 128) lane gather covers all NCT column tiles for both
  x0 and x0+1; row selection is compare/select accumulation against the
  block-local y0.

Exactness contract: every pixel whose four corners land inside its
block's window (ALL live pixels on realistic meshes — asserted by the
parity tests and measured on real smooth meshes) is bit-identical to the
XLA path. A live pixel that overflows the window (pathological local TPS
compression, never observed with the v2 window) contributes EXACT ZERO —
its weights are zeroed in the wrapper — and raises the ``violated`` flag;
dead pixels (zero weight sum) are exact zeros by the same cancellation
the XLA path uses. Output is therefore always either exact or zero,
never garbage (v1 clamped to nearest-in-window content instead).

The kernel is inference-only (no VJP): training uses the jnp path.
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
NT = 16         # row tiles fetched per block -> 128-row window
NCT = 3         # column tiles fetched per block -> 384-col window
Y_BUDGET = NT * RWIN - 2       # max block-local y0 (y0+1 must also fit)
X_BUDGET = NCT * COLS - 2      # max block-local x0 (x0+1 must also fit)


def _kernel(nrb: int, ncb: int, rorg_ref, corg_ref, ntl_ref, *refs):
    """refs: NT*NCT window tiles (row-major: tile k, column c), then
    y0_ref, x0_ref (block-local corner coords), then o_ref.

    The scalar-prefetch operands (rorg/corg/ntl) are FLAT [B*nrb*ncb]
    int32: Mosaic pads each SMEM array's trailing dims to vreg tiles
    (8 sublanes x 128 lanes), so a [B, nrb, ncb] layout costs
    B*roundup(nrb,8)*128 words — 3 x 448 KB at production shapes, which
    overflows the 1 MB SMEM (measured on chip, round 4). Flat 1-D arrays
    pad only to 128 lanes total."""
    del rorg_ref, corg_ref  # consumed by the index maps
    wins = refs[:NT * NCT]
    y0_ref, x0_ref, o_ref = refs[NT * NCT:]
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ntl = ntl_ref[(b * nrb + i) * ncb + j]
    y0 = y0_ref[0]                                  # (ROWS, COLS) int32
    x0 = x0_ref[0]                                  # window-local coords
    x1 = x0 + 1
    idx = jnp.concatenate(
        [jnp.clip(x0 - c * COLS, 0, COLS - 1) for c in range(NCT)]
        + [jnp.clip(x1 - c * COLS, 0, COLS - 1) for c in range(NCT)],
        axis=0)                                     # (2*NCT*ROWS, COLS)

    def seg_select(g, x, base):
        """Pick each lane's gathered value from its column segment."""
        out = g[(base + NCT - 1) * ROWS:(base + NCT) * ROWS]
        for c in range(NCT - 2, -1, -1):
            out = jnp.where(x < (c + 1) * COLS,
                            g[(base + c) * ROWS:(base + c + 1) * ROWS], out)
        return out

    o_ref[0] = jnp.zeros((4, ROWS, COLS), jnp.int32)
    for k in range(NT):
        @pl.when(k < ntl)
        def _tile(k=k):
            zero = jnp.zeros((ROWS, COLS), jnp.int32)
            acc_a = acc_c = acc_b = acc_d = zero
            for rr in range(RWIN):
                r = k * RWIN + rr
                rows = [wins[k * NCT + c][0, rr:rr + 1, :]
                        for c in range(NCT)]
                src = jnp.concatenate(
                    [jnp.broadcast_to(rows[c], (ROWS, COLS))
                     for c in range(NCT)] * 2, axis=0)
                g = jnp.take_along_axis(src, idx, axis=1)  # ONE lane gather
                g0 = seg_select(g, x0, 0)
                g1 = seg_select(g, x1, NCT)
                mt = y0 == r
                mb = y0 == r - 1
                acc_a = jnp.where(mt, g0, acc_a)
                acc_c = jnp.where(mt, g1, acc_c)
                acc_b = jnp.where(mb, g0, acc_b)
                acc_d = jnp.where(mb, g1, acc_d)
            # rows are disjoint across tiles and o_ref starts at zero, so
            # the merge is a plain accumulate
            o_ref[0, 0] += acc_a
            o_ref[0, 1] += acc_c
            o_ref[0, 2] += acc_b
            o_ref[0, 3] += acc_d


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _patch_gather_planes(padded: jnp.ndarray, y0i: jnp.ndarray,
                         x0i: jnp.ndarray, live: jnp.ndarray,
                         interpret: bool = False):
    """padded: [B, HP, WP] int32 (packed, edge+zero padded); y0i/x0i:
    [B, OHp, OWp] CLAMPED absolute corner coords (OHp % 8 == 0,
    OWp % 128 == 0); live: [B, OHp, OWp] bool — pixels with nonzero
    bilinear weight sum (only these constrain the windows). Returns
    ([B, 4, OHp, OWp] int32 planes in (a, c, b, d) = (y0x0, y0x1, y1x0,
    y1x1) order, bad: [B, OHp, OWp] bool — live pixels whose corners
    overflow their block's window; their planes are NOT exact and the
    caller must zero their weights)."""
    B, HP, WP = padded.shape
    _, OHp, OWp = y0i.shape
    nrb, ncb = OHp // ROWS, OWp // COLS

    yb = y0i.reshape(B, nrb, ROWS, ncb, COLS)
    xb = x0i.reshape(B, nrb, ROWS, ncb, COLS)
    lb = live.reshape(B, nrb, ROWS, ncb, COLS)
    big = jnp.int32(1 << 20)
    ymin = jnp.where(lb, yb, big).min(axis=(2, 4))
    ymax = jnp.where(lb, yb, -1).max(axis=(2, 4))
    xmin = jnp.where(lb, xb, big).min(axis=(2, 4))
    rorg = jnp.clip(ymin // RWIN, 0, HP // RWIN - NT).astype(jnp.int32)
    corg = jnp.clip(xmin // COLS, 0, WP // COLS - NCT).astype(jnp.int32)
    # dynamic trip count: row tiles covering the block's live span (+1 for
    # the y0+1 corner row); dead blocks run one tile
    span = ymax - rorg * RWIN
    ntl = jnp.clip((span + 2 + RWIN - 1) // RWIN, 1, NT).astype(jnp.int32)

    def expand(v):
        return jnp.repeat(jnp.repeat(v, ROWS, axis=1), COLS, axis=2)

    y0l = y0i - expand(rorg * RWIN)
    x0l = x0i - expand(corg * COLS)
    # live pixels beyond the window get exact-zero treatment upstream
    # (weights zeroed); dead pixels are exact zeros by weight cancellation
    # for ANY gathered value, so only live overflows matter
    bad = live & ((y0l > Y_BUDGET) | (x0l > X_BUDGET) | (x0l < 0))

    def win_spec(k, c):
        return pl.BlockSpec(
            (1, RWIN, COLS),
            lambda b, i, j, r, cg, n, k=k, c=c: (
                b, r[(b * nrb + i) * ncb + j] + k,
                cg[(b * nrb + i) * ncb + j] + c),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nrb, ncb),
        in_specs=(
            [win_spec(k, c) for k in range(NT) for c in range(NCT)]
            + [pl.BlockSpec((1, ROWS, COLS),
                            lambda b, i, j, r, cg, n: (b, i, j),
                            memory_space=pltpu.VMEM)] * 2
        ),
        out_specs=pl.BlockSpec((1, 4, ROWS, COLS),
                               lambda b, i, j, r, cg, n: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
    )
    planes = pl.pallas_call(
        functools.partial(_kernel, nrb, ncb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, OHp, OWp), jnp.int32),
        interpret=interpret,
    )(rorg.reshape(-1), corg.reshape(-1), ntl.reshape(-1),
      *([padded] * (NT * NCT)), y0l, x0l)
    return planes, bad


def bilinear_sample_patch_u8_pallas(im: jnp.ndarray, x: jnp.ndarray,
                                    y: jnp.ndarray,
                                    out_hw: Tuple[int, int],
                                    interpret: bool | None = None,
                                    combine_layout: str = "flat",
                                    shard_mesh=None):
    """Kernel-backed :func:`ops.interp.bilinear_sample_patch_u8`.

    ``shard_mesh``: an active GSPMD mesh with a ``data`` axis. A bare
    pallas_call cannot auto-partition, so under a mesh the whole sampler
    (window-origin algebra + kernel + combine) is shard_mapped over the
    batch axis; the ``violated`` flag is pmax-reduced across shards so
    every device returns the global flag. The batch must divide the data
    axis — callers gate on that and fall back to the XLA gather
    (ops/tps.py:tps_warp_with_mask, pipeline/compositor._composite_chunk).

    im: [B, H, W, 3] uint8; x, y: [B, N] normalized coords laid out as an
    (out_h, out_w) raster (N == out_h*out_w — the kernel tiles the output
    spatially, so it needs the 2-D structure the flat samplers don't).
    Returns ([B, out_h, out_w, 3] float samples in x's dtype — the 2-D
    canvas layout, so callers' reshape-to-canvas is an identity and the
    crop slice fuses downstream — and a violated bool scalar).
    ``violated`` reports a live pixel overflowing its block's source
    window (never observed on real meshes with the v2 window — see module
    docstring); such pixels contribute exact ZERO instead of garbage.
    Everywhere else the result is bit-identical to the XLA path.
    """
    dp = shard_mesh.shape.get("data", 1) if shard_mesh is not None else 1
    if dp > 1:
        assert im.shape[0] % dp == 0, (im.shape, dict(shard_mesh.shape))
        from jax.sharding import PartitionSpec as P

        n_out = 3 if combine_layout == "planes" else 1

        def fn(ims, xs, ys):
            *outs, viol = bilinear_sample_patch_u8_pallas(
                ims, xs, ys, out_hw, interpret=interpret,
                combine_layout=combine_layout)
            # replicate the overflow flag: every shard reports global OR
            viol = jax.lax.pmax(viol.astype(jnp.int32),
                                "data").astype(jnp.bool_)
            return tuple(outs) + (viol,)

        # check_vma=False: pallas_call out_shapes don't carry varying-
        # across-mesh annotations, and the kernel is per-shard pure
        fn = jax.shard_map(fn, mesh=shard_mesh, in_specs=(P("data"),) * 3,
                           out_specs=(P("data"),) * n_out + (P(),),
                           check_vma=False)
        return fn(im, x, y)

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
    # zero-pad to the window grid: rows to a multiple of RWIN with at
    # least NT tiles, cols to a multiple of COLS with at least NCT blocks
    HP = max(_round_up(H + 1, RWIN), NT * RWIN)
    WP = max(_round_up(W + 1, COLS) + (NCT - 1) * COLS, NCT * COLS)
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)), mode="edge")
    padded = jnp.pad(padded, ((0, 0), (0, HP - (H + 1)), (0, WP - (W + 1))))

    wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x, y, H, W)
    # support mask: the arithmetic coverage sum (== bilinear_mask) — dead
    # pixels cancel to exact zero for any corner content, so they must not
    # constrain the block windows
    live2 = ((wa + wb + wc + wd) > 0).reshape(B, oh, ow)
    OHp, OWp = _round_up(oh, ROWS), _round_up(ow, COLS)
    y2 = y0i.reshape(B, oh, ow)
    x2 = x0i.reshape(B, oh, ow)
    if (OHp, OWp) != (oh, ow):
        y2 = jnp.pad(y2, ((0, 0), (0, OHp - oh), (0, OWp - ow)), mode="edge")
        x2 = jnp.pad(x2, ((0, 0), (0, OHp - oh), (0, OWp - ow)), mode="edge")
        live2 = jnp.pad(live2, ((0, 0), (0, OHp - oh), (0, OWp - ow)))

    planes, bad = _patch_gather_planes(padded, y2, x2, live2,
                                       interpret=interpret)
    # dead pixels are exact zeros in the XLA path (their weights cancel
    # against EQUAL corner values); the kernel's dynamic trip count may
    # leave some of a dead pixel's corner rows unprocessed (plane a real,
    # plane b still zero), which would break that cancellation — so zero
    # their weights outright: 0 is their exact value. Live overflow pixels
    # (bad) get the same exact-zero treatment and raise the flag.
    #
    # combine_layout picks WHERE the weighted unpack runs — XLA:TPU's
    # fusion choices differ sharply by downstream consumer (chip-measured,
    # BENCHMARKS.md round 4):
    #  - 'canvas2d': combine in the PADDED [B, OHp, OWp] layout; the
    #    (oh, ow) crop stays a lazy slice that fuses into planar
    #    consumers (the yuv420 composite: 18.6 -> 15.9 ms/chunk).
    #  - 'flat' (default): slice+flat-reshape the planes first, combine
    #    at [B, oh*ow]; the right choice for interleaved [..., 3] uint8
    #    outputs (the bgr composite: the 2-D combine regresses it ~8x).
    if combine_layout in ("canvas2d", "planes"):
        keep2 = jnp.where(live2 & ~bad, jnp.ones((), compute_dtype),
                          jnp.zeros((), compute_dtype))

        def w2(w):
            w = w.reshape(B, oh, ow)
            if (OHp, OWp) != (oh, ow):
                w = jnp.pad(w, ((0, 0), (0, OHp - oh), (0, OWp - ow)))
            return w * keep2

        viol2 = jnp.any(bad[:, :oh, :ow])
        if combine_layout == "planes":
            # per-channel planar combine: the yuv420 composite never
            # interleaves (see _combine_patch_u8_planes)
            from stabstitch2_tpu.ops.interp import _combine_patch_u8_planes

            pb, pg, pr = _combine_patch_u8_planes(
                planes[:, 0], planes[:, 2], planes[:, 1], planes[:, 3],
                w2(wa), w2(wb), w2(wc), w2(wd), compute_dtype)
            return (pb[:, :oh, :ow], pg[:, :oh, :ow], pr[:, :oh, :ow],
                    viol2)
        out = _combine_patch_u8(planes[:, 0], planes[:, 2], planes[:, 1],
                                planes[:, 3], w2(wa), w2(wb), w2(wc),
                                w2(wd), compute_dtype)
        return out[:, :oh, :ow], viol2
    assert combine_layout == "flat", combine_layout
    pl_ = planes[:, :, :oh, :ow].reshape(B, 4, oh * ow)
    badf = bad[:, :oh, :ow].reshape(B, oh * ow)
    livef = live2[:, :oh, :ow].reshape(B, oh * ow)
    keep = jnp.where(livef & ~badf, jnp.ones((), compute_dtype),
                     jnp.zeros((), compute_dtype))
    out = _combine_patch_u8(pl_[:, 0], pl_[:, 2], pl_[:, 1], pl_[:, 3],
                            wa * keep, wb * keep, wc * keep, wd * keep,
                            compute_dtype)
    return out.reshape(B, oh, ow, 3), jnp.any(badf)
