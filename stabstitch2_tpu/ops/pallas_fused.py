"""ONE-program composite warp: TPS eval + window gather + combine (v3).

Round-4 verdict item 1: the TPU composite ran as THREE programs — the
Pallas TPS-coords kernel (ops/pallas_warp.py), an XLA epilogue
(corner/weight algebra + support-masked window-origin reductions), and
the Pallas window-gather kernel (ops/pallas_gather.py) — with the
[B, 2, HW] coordinate field and the [B, 4, OHp, OWp] corner planes
round-tripping through HBM between them. The round-5 decomposition probe
(examples/probe_fused_decomp.py) measured the seams at ~1.2 ms of the
5.9 ms chunk (same-day); this kernel removes them and, more importantly,
makes the window shape a STATIC PER-RESOLUTION parameter: the v2 fixed
128x384 window overflows real meshes at 720p-class frames (live yspan
max 219 vs its 126-row budget, examples/diag_gather_violation.py), which
silently degraded every hi-res chunk to the 6.2x-slower XLA repair path.

Design (per (8, 128) canvas block, grid (B, nrb, ncb)):
- evaluate the TPS spline in-register (P=63 control points unrolled,
  same accumulation order as ops/pallas_warp._kernel, so coordinates
  are bit-identical to the coords-kernel path);
- corner/weight algebra in-register (same order as
  ops/interp._patch_weights_idx);
- the source window arrives as ONE pl.Element BlockSpec whose dynamic
  element offsets come from scalar-prefetched per-block origins in
  tile units (Mosaic must PROVE the offset divides the (8, 128)
  tiling, so the index map multiplies tile counts by RWIN/COLS);
- window origins are ESTIMATES from a coarse block-corner lattice
  (clip-to-image approximates the v2 support-masked min/max; the
  lattice is (nrb+1) x (ncb+1) spline evaluations — a tiny XLA einsum)
  padded by static margins. Estimates can be wrong: every live pixel
  whose corners fall outside the fetched window, or beyond the block's
  DYNAMIC processed-row count, is emitted as EXACT ZERO and raises the
  per-block `bad` plane — callers repair flagged chunks through the
  XLA path exactly like the v2 contract (pipeline/compositor.py:
  composite_finish). Wrong origins cost performance, never correctness.
- the gather row loop is the v2 per-row broadcast + ONE stacked lane
  gather per window row (Mosaic's envelope: lane gathers <= 128 lanes,
  examples/probe_mosaic_gather.py); corner planes accumulate per tile
  and the bilinear combine (same order as ops/interp._combine_patch_u8)
  runs per tile in-register, so the only cross-path difference vs the
  XLA combine is FMA contraction/association (<= 1 uint8 LSB on a tiny
  fraction of pixels; PARITY.md).

Outputs per image: B, G, R weighted-sample planes (f32), the coverage
mask (== ops/interp.bilinear_mask algebra, for LINEAR fusion), and the
`bad` overflow plane. View fusion (AVERAGE/LINEAR) stays in XLA: LINEAR
needs whole-canvas blend masks (Gaussian-blurred seam), which cannot be
computed per block.

Reference semantics anchor: torch_tps_transform.py:139-165 (spline
eval) + torch_homo_transform.py:50-125 (manual bilinear sampler).
Inference-only (no VJP): training uses the jnp path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RBF_EPS = 1e-6
ROWS = 8        # canvas block height
COLS = 128      # canvas block width (one vreg of lanes)
RWIN = 8        # window row-origin quantum (sublane tile height)

# origin-estimate safety margins (px), applied to the coarse-lattice
# min/max before quantization. The lattice is exact at block corners;
# the margins cover in-block spline curvature between them. Validated
# against real smooth meshes by examples/diag_gather_violation.py.
MARGIN_Y = 16
MARGIN_X = 48


def fused_window_tiles(H: int, W: int) -> Tuple[int, int]:
    """Static window shape (row tiles, col tiles) for a source HxW.

    Live spans measured on real smooth meshes scale with the SOURCE
    resolution (same warp Jacobian, more pixels): 360x480 needs <=118
    rows / <=~340 cols, 720p <=219 rows / <=383 cols
    (examples/diag_gather_violation.py round 4/5 chip runs). Budgets
    below keep >= ~30% slack over the worst measured span plus the
    origin-estimate margins.
    """
    if H <= 480:
        return 20, 3       # 160-row window, 384-col
    if H <= 800:
        return 36, 5       # 288-row window, 640-col
    return 52, 7           # 416-row window, 896-col


def _kernel(nrb: int, ncb: int, nt: int, nct: int, H: int, W: int,
            num_points: int,
            roff_ref, coff_ref,
            t_ref, src_ref, gx_ref, gy_ref, win_ref, o_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    flat = (b * nrb + i) * ncb + j
    roff = roff_ref[flat] * RWIN   # window origin, element units
    coff = coff_ref[flat] * COLS

    # ---- TPS spline eval (== ops/pallas_warp._kernel, same order) ----
    gx = gx_ref[:]                 # (ROWS, COLS) normalized grid coords
    gy = gy_ref[:]
    acc_x = t_ref[0, 0, 0] + t_ref[0, 0, 1] * gx + t_ref[0, 0, 2] * gy
    acc_y = t_ref[0, 1, 0] + t_ref[0, 1, 1] * gx + t_ref[0, 1, 2] * gy
    for p in range(num_points):
        dx = gx - src_ref[0, p, 0]
        dy = gy - src_ref[0, p, 1]
        d2 = dx * dx + dy * dy
        r = d2 * jnp.log(d2 + _RBF_EPS)
        acc_x = acc_x + t_ref[0, 0, 3 + p] * r
        acc_y = acc_y + t_ref[0, 1, 3 + p] * r

    # ---- corner/weight algebra (== ops/interp._patch_weights_idx) ----
    xf = (acc_x + 1.0) * (W / 2.0)
    yf = (acc_y + 1.0) * (H / 2.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    x0c = jnp.clip(x0, 0.0, W - 1)
    x1c = jnp.clip(x0 + 1.0, 0.0, W - 1)
    y0c = jnp.clip(y0, 0.0, H - 1)
    y1c = jnp.clip(y0 + 1.0, 0.0, H - 1)
    inside = (x0 >= 0.0) & (y0 >= 0.0)
    zero = jnp.zeros((), jnp.float32)
    wa = jnp.where(inside, (x1c - xf) * (y1c - yf), zero)
    wb = jnp.where(inside, (x1c - xf) * (yf - y0c), zero)
    wc = jnp.where(inside, (xf - x0c) * (y1c - yf), zero)
    wd = jnp.where(inside, (xf - x0c) * (yf - y0c), zero)
    # coverage mask: ops/interp.bilinear_mask algebra (NO inside gate)
    msk = ((x1c - xf) * (y1c - yf) + (x1c - xf) * (yf - y0c)
           + (xf - x0c) * (y1c - yf) + (xf - x0c) * (yf - y0c))
    # support mask in FACTORED form: (wa+wb+wc+wd) == (x1c-x0c)*(y1c-y0c)
    # exactly, but the 4-term sum suffers catastrophic cancellation at
    # dead pixels (weights up to ~1e2 cancel to ~1e-6 f32 noise) AND the
    # compiler may rematerialize the comparison per consumer with
    # different contraction — measured on XLA:CPU: keep evaluated TRUE
    # for three weights and FALSE for the fourth, breaking the exact
    # dead-pixel cancellation (round-5 debug). The factored product is
    # EXACTLY zero for dead pixels: no noise, no per-consumer flip.
    live = inside & ((x1c - x0c) * (y1c - y0c) > 0)

    y0i = y0c.astype(jnp.int32)
    x0i = x0c.astype(jnp.int32)
    y0l = y0i - roff               # window-local corner coords
    x0l = x0i - coff
    x1l = x0l + 1
    # exact-or-zero: a live pixel whose corners the fetched window does
    # not cover is zeroed + flagged (the caller repairs flagged chunks
    # through the XLA path).
    bad = live & ((y0l < 0) | (y0l > nt * RWIN - 2)
                  | (x0l < 0) | (x0l > nct * COLS - 2))
    liveok = live & ~bad
    keep = jnp.where(liveok, jnp.float32(1), jnp.float32(0))
    wa = wa * keep
    wb = wb * keep
    wc = wc * keep
    wd = wd * keep

    o_ref[0, 3] = msk
    o_ref[0, 4] = bad.astype(jnp.float32)

    # stacked per-segment gather indices (built once; v2 pattern)
    idx = jnp.concatenate(
        [jnp.clip(x0l - c * COLS, 0, COLS - 1) for c in range(nct)]
        + [jnp.clip(x1l - c * COLS, 0, COLS - 1) for c in range(nct)],
        axis=0)                                     # (2*nct*ROWS, COLS)

    def seg_select(g, x, base):
        out = g[(base + nct - 1) * ROWS:(base + nct) * ROWS]
        for c in range(nct - 2, -1, -1):
            out = jnp.where(x < (c + 1) * COLS,
                            g[(base + c) * ROWS:(base + c + 1) * ROWS], out)
        return out

    # DYNAMIC tile loop with EXACT in-kernel bounds: the kernel knows
    # every pixel's y0l, so the loop covers exactly the live tiles —
    # origin-estimate margins cost window-DMA bytes but ZERO loop trips
    # (the first fused A/B ran margin-inflated prefetched trip counts
    # and lost to v2 12.86 vs 10.19 ms; BENCHMARKS round 5). Dead blocks
    # run zero trips. The aligned dynamic sublane slice + vector carries
    # were chip-probed (examples/probe_dynslice.py); static unrolling
    # would grow code size with the per-resolution window height.
    big = jnp.int32(1 << 20)
    kmin = jnp.clip(jnp.min(jnp.where(liveok, y0l, big)) // RWIN,
                    0, nt - 1)
    kmax = jnp.clip(jnp.max(jnp.where(liveok, y0l + 1, -big)) // RWIN,
                    -1, nt - 1)

    def tile_body(k, carry):
        ob, og, orr = carry
        tile = win_ref[pl.ds(k * RWIN, RWIN), :]    # (RWIN, win_w)
        izero = jnp.zeros((ROWS, COLS), jnp.int32)
        acc_a = acc_c = acc_b = acc_d = izero
        for rr in range(RWIN):
            r = k * RWIN + rr
            rows = [tile[rr:rr + 1, c * COLS:(c + 1) * COLS]
                    for c in range(nct)]
            src = jnp.concatenate(
                [jnp.broadcast_to(rows[c], (ROWS, COLS))
                 for c in range(nct)] * 2, axis=0)
            g = jnp.take_along_axis(src, idx, axis=1)
            g0 = seg_select(g, x0l, 0)
            g1 = seg_select(g, x1l, nct)
            mt = y0l == r
            mb = y0l == r - 1
            acc_a = jnp.where(mt, g0, acc_a)
            acc_c = jnp.where(mt, g1, acc_c)
            acc_b = jnp.where(mb, g0, acc_b)
            acc_d = jnp.where(mb, g1, acc_d)
        # per-tile weighted combine (rows are disjoint across tiles;
        # unpack(0) == 0, so accumulation == the straight-line sum up
        # to f32 association)

        def ch(shift):
            ua = ((acc_a >> shift) & 0xFF).astype(jnp.float32)
            ub = ((acc_b >> shift) & 0xFF).astype(jnp.float32)
            uc = ((acc_c >> shift) & 0xFF).astype(jnp.float32)
            ud = ((acc_d >> shift) & 0xFF).astype(jnp.float32)
            return wa * ua + wb * ub + wc * uc + wd * ud

        return ob + ch(0), og + ch(8), orr + ch(16)

    fzero = jnp.zeros((ROWS, COLS), jnp.float32)
    ob, og, orr = jax.lax.fori_loop(kmin, kmax + 1, tile_body,
                                    (fzero, fzero, fzero))
    o_ref[0, 0] = ob
    o_ref[0, 1] = og
    o_ref[0, 2] = orr


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("out_size", "nt", "nct",
                                             "interpret"))
def _fused_planes(padded: jnp.ndarray, T: jnp.ndarray, source: jnp.ndarray,
                  gx2: jnp.ndarray, gy2: jnp.ndarray,
                  roff_t: jnp.ndarray, coff_t: jnp.ndarray,
                  out_size: Tuple[int, int],
                  nt: int, nct: int, interpret: bool = False):
    """padded: [B, HP, WP] int32 packed source; T: [B, 2, P+3];
    source: [B, P, 2]; gx2: [ROWS, OWp]; gy2: [OHp, COLS]; roff_t/
    coff_t: flat [B*nrb*ncb] int32 tile-unit window origins.
    Returns [B, 5, OHp, OWp] f32 planes (B, G, R, mask, bad)."""
    B, HP, WP = padded.shape
    OHp, OWp = gy2.shape[0], gx2.shape[1]
    nrb, ncb = OHp // ROWS, OWp // COLS
    P = source.shape[1]
    H, W = out_size  # source image dims (sampling target)

    win_h, win_w = nt * RWIN, nct * COLS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nrb, ncb),
        in_specs=[
            pl.BlockSpec((1, 2, P + 3), lambda b, i, j, r, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 2), lambda b, i, j, r, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda b, i, j, r, c: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda b, i, j, r, c: (i, 0),
                         memory_space=pltpu.VMEM),
            # the whole window as ONE dynamic-element-offset spec; tile-
            # unit scalars are multiplied here so Mosaic can prove the
            # offsets divide the (8, 128) tiling
            pl.BlockSpec(
                (None, pl.Element(win_h), pl.Element(win_w)),
                lambda b, i, j, r, c: (
                    b, r[(b * nrb + i) * ncb + j] * RWIN,
                    c[(b * nrb + i) * ncb + j] * COLS),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, ROWS, COLS),
                               lambda b, i, j, r, c: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, nrb, ncb, nt, nct, H, W, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 5, OHp, OWp), jnp.float32),
        interpret=interpret,
    )(roff_t, coff_t, T, source, gx2, gy2, padded)


def window_origins(T, source, nrb: int, ncb: int, im_hw, padded_hw,
                   nt: int, nct: int, step_x, step_y):
    """Per-block window origins (TILE units) from a block-boundary lattice.

    The lattice's x pitch is COLS/2 = 64 px, not the 128-px block width:
    TPS control-point spacing is ~65 px at production canvases, so the
    spline bends measurably BETWEEN 128-px-apart samples — a corner-only
    lattice under-estimated block minima by up to 43 px on real meshes
    (examples/diag_fused_origins.py), overflowing the placed window and
    triggering whole-chunk XLA repairs. Halving the pitch cuts the
    interpolation error ~4x; the y pitch (8 px) is already fine. These
    are ESTIMATES placing the fetched window + margins: misses are
    exact-zeroed + flagged + repaired by the caller, never wrong. The
    kernel's loop bounds come from the exact in-register corner rows, so
    margins cost DMA bytes, never loop trips.
    """
    from stabstitch2_tpu.ops.precision import HIGHEST
    from stabstitch2_tpu.ops.tps import _eval_grid_rows

    B = T.shape[0]
    H, W = im_hw
    HP, WP = padded_hw
    dtype = T.dtype
    nlx = 2 * ncb + 1
    lat_x = -1.0 + step_x * ((COLS // 2) * jnp.arange(nlx, dtype=dtype))
    lat_y = -1.0 + step_y * (ROWS * jnp.arange(nrb + 1, dtype=dtype))
    L = (nrb + 1) * nlx
    glx = jnp.broadcast_to(jnp.tile(lat_x[None, :], (nrb + 1, 1))
                           .reshape(-1)[None], (B, L))
    gly = jnp.broadcast_to(jnp.tile(lat_y[:, None], (1, nlx))
                           .reshape(-1)[None], (B, L))
    rows = _eval_grid_rows(glx, gly, source)         # [B, P+3, L]
    lat = jnp.einsum("bij,bjn->bin", T, rows, precision=HIGHEST)
    xf_l = jnp.clip((lat[:, 0] + 1.0) * (W / 2.0), 0.0, W - 1)
    yf_l = jnp.clip((lat[:, 1] + 1.0) * (H / 2.0), 0.0, H - 1)
    xf_l = xf_l.reshape(B, nrb + 1, nlx)
    yf_l = yf_l.reshape(B, nrb + 1, nlx)

    def corner_min(a):
        # min over each block's 6 lattice points: rows {i, i+1} x cols
        # {2j, 2j+1, 2j+2}
        ymin2 = jnp.minimum(a[:, :-1], a[:, 1:])     # [B, nrb, nlx]
        return jnp.minimum(jnp.minimum(ymin2[:, :, 0:-2:2],
                                       ymin2[:, :, 1:-1:2]),
                           ymin2[:, :, 2::2])

    ymin = jnp.floor(corner_min(yf_l)).astype(jnp.int32) - MARGIN_Y
    xmin = jnp.floor(corner_min(xf_l)).astype(jnp.int32) - MARGIN_X
    roff_t = jnp.clip(ymin // RWIN, 0, HP // RWIN - nt)
    coff_t = jnp.clip(xmin // COLS, 0, WP // COLS - nct)
    return roff_t, coff_t


def fused_warp_planes(im: jnp.ndarray, T: jnp.ndarray, source: jnp.ndarray,
                      out_size: Tuple[int, int], grid_span=None,
                      nt: int | None = None, nct: int | None = None,
                      interpret: bool | None = None, shard_mesh=None):
    """Fused composite warp. im: [B, H, W, 3] uint8; T: [B, 2, P+3];
    source: [B, P, 2] (the deformed mesh, normalized); out_size: the
    (padded) canvas dims; grid_span: TRUE canvas extents (traced or
    static) — the normalization span, exactly as
    ops/tps.tps_sample_coords.

    Returns (planes_b, planes_g, planes_r, mask, viol): [B, oh, ow] f32
    weighted samples per channel + coverage mask + the overflow flag.

    ``shard_mesh``: under a GSPMD mesh the whole program is shard_mapped
    over the batch axis (a bare pallas_call cannot auto-partition);
    callers gate on batch divisibility and fall back to XLA otherwise.
    """
    from stabstitch2_tpu.ops.interp import pack_bgr_u8
    from stabstitch2_tpu.ops.tps import _span_step

    B, H, W, C = im.shape
    oh, ow = out_size
    assert C == 3 and im.dtype == jnp.uint8, (im.shape, im.dtype)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if nt is None or nct is None:
        nt_d, nct_d = fused_window_tiles(H, W)
        nt = nt if nt is not None else nt_d
        nct = nct if nct is not None else nct_d

    dp = shard_mesh.shape.get("data", 1) if shard_mesh is not None else 1
    if dp > 1:
        assert B % dp == 0, (im.shape, dict(shard_mesh.shape))
        from jax.sharding import PartitionSpec as P

        span = grid_span if grid_span is not None else out_size
        sh = jnp.asarray(span[0], T.dtype)
        sw = jnp.asarray(span[1], T.dtype)

        def fn(ims, Ts, srcs, a, b):
            *outs, viol = fused_warp_planes(ims, Ts, srcs, out_size,
                                            grid_span=(a, b), nt=nt,
                                            nct=nct, interpret=interpret)
            viol = jax.lax.pmax(viol.astype(jnp.int32),
                                "data").astype(jnp.bool_)
            return tuple(outs) + (viol,)

        fn = jax.shard_map(fn, mesh=shard_mesh,
                           in_specs=(P("data"),) * 3 + (P(), P()),
                           out_specs=(P("data"),) * 4 + (P(),),
                           check_vma=False)
        return fn(im, T, source, sh, sw)

    span_h, span_w = grid_span if grid_span is not None else out_size
    dtype = T.dtype

    # ---- packed source, padded to the window grid (v2 layout) ----
    packed = pack_bgr_u8(im)
    HP = max(_round_up(H + 1, RWIN), nt * RWIN)
    WP = max(_round_up(W + 1, COLS) + (nct - 1) * COLS, nct * COLS)
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)), mode="edge")
    padded = jnp.pad(padded, ((0, 0), (0, HP - (H + 1)), (0, WP - (W + 1))))

    # ---- normalized output grid (pad region pushed out-of-image) ----
    OHp, OWp = _round_up(oh, ROWS), _round_up(ow, COLS)
    nrb, ncb = OHp // ROWS, OWp // COLS
    step_x = _span_step(span_w, dtype)
    step_y = _span_step(span_h, dtype)
    gx_row = -1.0 + step_x * jnp.arange(ow, dtype=dtype)
    gy_col = -1.0 + step_y * jnp.arange(oh, dtype=dtype)
    gx_row = jnp.pad(gx_row, (0, OWp - ow), constant_values=1.0)
    gy_col = jnp.pad(gy_col, (0, OHp - oh), constant_values=1.0)
    gx2 = jnp.tile(gx_row[None, :], (ROWS, 1))
    gy2 = jnp.tile(gy_col[:, None], (1, COLS))

    roff_t, coff_t = window_origins(T, source, nrb, ncb, (H, W),
                                    (HP, WP), nt, nct, step_x, step_y)

    out = _fused_planes(padded, T, source, gx2, gy2,
                        roff_t.reshape(-1).astype(jnp.int32),
                        coff_t.reshape(-1).astype(jnp.int32),
                        (H, W), nt, nct, interpret=interpret)
    pb = out[:, 0, :oh, :ow]
    pg = out[:, 1, :oh, :ow]
    pr = out[:, 2, :oh, :ow]
    mask = out[:, 3, :oh, :ow]
    viol = jnp.any(out[:, 4, :oh, :ow] > 0)
    return pb, pg, pr, mask, viol
