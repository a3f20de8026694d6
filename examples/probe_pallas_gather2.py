"""Feasibility probe v2: VMEM warp gather via scalar-prefetch block windows.

The composite's dominant device cost is ONE [B, HW, 4]-int32
take_along_axis at canvas resolution (~23 ms per 16-image chunk,
BENCHMARKS.md round 3b). Probe v1 (single whole-image VMEM block +
per-row 544-lane gathers) does NOT compile: Mosaic's tpu.dynamic_gather
requires the gather source to fit ONE vreg along the gather dimension
(<=128 lanes; examples/probe_mosaic_gather.py maps the envelope).

v2 design, built around what lowers:
- grid (B, OH/8, OW/128); each step produces an (8, 128) canvas block's
  2x2 source patch (4 int32 planes).
- the source window for a block is fetched by DATA-DEPENDENT BlockSpec
  index maps (PrefetchScalarGridSpec): per-block row/col window origins
  (16-row / 128-col block indices, computed with cheap jnp reductions
  outside) select four (16, 128) tiles of the padded source — no
  in-kernel dynamic slicing at all.
- per window row r (static 31-iteration loop): ONE stacked (32, 128)
  lane gather covers both column halves for both x0 and x0+1; row
  selection is mask/select accumulation (y-match), exactly probe v1's
  scheme.

Invariants (asserted host-side by check_span, and cheap to guarantee in
production because the canvas is never smaller than the source, so the
canvas->source slope is <= 1):
- per-block source row span (16-quantized origin) <= 30, i.e. y0+1 fits
  the 32-row window;
- per-block source col span (128-quantized origin) <= 254, i.e. x0+1
  fits the 256-col window.

Run on the real chip (default env, TPU cache):
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/probe_pallas_gather2.py
"""

from __future__ import annotations

import contextlib
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8        # canvas block height
COLS = 128      # canvas block width (one vreg of lanes)
RWIN = 16       # source row-window block height (origin quantization)
RLOOP = 31      # static row iterations: covers y0 local span + the +1 row

if os.environ.get("PROBE_SMALL"):
    B, H, W = 2, 40, 48
    OH, OW = 48, 128
    HP, WP = 48, 256
else:
    B, H, W = 16, 360, 480      # source frames (packed int32)
    OH, OW = 384, 640           # canvas (8/128-aligned; 544 padded to 640)
    HP = 368                    # >= H+1 edge row, multiple of RWIN
    WP = 768                    # >= W+1, multiple of COLS, with slack for
                                # the corg+1 window


def _kernel(rorg_ref, corg_ref, wtl_ref, wtr_ref, wbl_ref, wbr_ref,
            y0_ref, x0_ref, o_ref):
    del rorg_ref, corg_ref  # consumed by the index maps
    b, rb, cb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    del b, rb, cb
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
    acc00 = jnp.zeros_like(x0)
    acc01 = jnp.zeros_like(x0)
    acc10 = jnp.zeros_like(x0)
    acc11 = jnp.zeros_like(x0)
    for r in range(RLOOP):
        if r < RWIN:
            row_a = wtl_ref[0, r:r + 1, :]
            row_b = wtr_ref[0, r:r + 1, :]
        else:
            row_a = wbl_ref[0, r - RWIN:r - RWIN + 1, :]
            row_b = wbr_ref[0, r - RWIN:r - RWIN + 1, :]
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
        acc00 = jnp.where(mt, g0, acc00)
        acc01 = jnp.where(mt, g1, acc01)
        acc10 = jnp.where(mb, g0, acc10)
        acc11 = jnp.where(mb, g1, acc11)
    o_ref[0, 0] = acc00
    o_ref[0, 1] = acc01
    o_ref[0, 2] = acc10
    o_ref[0, 3] = acc11


def _window_origins(y0, x0):
    """Per-(8,128)-block source window origins, in window-block units."""
    nrb, ncb = OH // ROWS, OW // COLS
    yb = y0.reshape(B, nrb, ROWS, ncb, COLS).min(axis=(2, 4))
    xb = x0.reshape(B, nrb, ROWS, ncb, COLS).min(axis=(2, 4))
    rorg = jnp.clip(yb // RWIN, 0, HP // RWIN - 2).astype(jnp.int32)
    corg = jnp.clip(xb // COLS, 0, WP // COLS - 2).astype(jnp.int32)
    return rorg, corg


@jax.jit
def pallas_patch_gather(img, y0, x0):
    """img: [B, HP, WP] int32; y0/x0: [B, OH, OW] int32 -> [B, 4, OH, OW]."""
    rorg, corg = _window_origins(y0, x0)
    nrb, ncb = OH // ROWS, OW // COLS
    # window-local coordinates (the kernel never sees absolute ones)
    def expand(v):
        return jnp.repeat(jnp.repeat(v, ROWS, axis=1), COLS, axis=2)

    y0l = y0 - expand(rorg * RWIN)
    x0l = x0 - expand(corg * COLS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nrb, ncb),
        in_specs=[
            pl.BlockSpec((1, RWIN, COLS),
                         lambda b, i, j, r, c: (b, r[b, i, j], c[b, i, j]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RWIN, COLS),
                         lambda b, i, j, r, c: (b, r[b, i, j],
                                                c[b, i, j] + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RWIN, COLS),
                         lambda b, i, j, r, c: (b, r[b, i, j] + 1,
                                                c[b, i, j]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RWIN, COLS),
                         lambda b, i, j, r, c: (b, r[b, i, j] + 1,
                                                c[b, i, j] + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda b, i, j, r, c: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, COLS), lambda b, i, j, r, c: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, ROWS, COLS),
                               lambda b, i, j, r, c: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, OH, OW), jnp.int32),
    )(rorg, corg, img, img, img, img, y0l, x0l)


@jax.jit
def xla_patch_gather(img, y0, x0):
    """The production formulation: one [B, N, 4] HBM gather."""
    patch = jnp.stack([img[:, :H, :W], img[:, :H, 1:W + 1],
                       img[:, 1:H + 1, :W], img[:, 1:H + 1, 1:W + 1]],
                      axis=-1).reshape(B, H * W, 4)
    idx = (y0 * W + x0).reshape(B, OH * OW)
    g = jnp.take_along_axis(patch, idx[..., None], axis=1)
    return jnp.transpose(g.reshape(B, OH, OW, 4), (0, 3, 1, 2))


def make_inputs(key):
    k1, k2 = jax.random.split(key)
    img = jax.random.randint(k1, (B, HP, WP), 0, 1 << 24, jnp.int32)
    # smooth warp coords: mostly-identity scale + mild shear/wobble so each
    # 8-row block touches < RLOOP source rows (the production invariant)
    yy = jnp.arange(OH, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(OW, dtype=jnp.float32)[None, None, :]
    ph = jax.random.uniform(k2, (B, 1, 1), jnp.float32, 0.0, 6.28)
    ys = yy * 0.92 + 3.0 * jnp.sin(xx / OW * 4.0 + ph) + 2.0
    xs = xx * 0.73 + 2.0 * jnp.cos(yy / OH * 5.0 + ph) + 1.0
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y0 = jnp.broadcast_to(y0, (B, OH, OW))
    x0 = jnp.broadcast_to(x0, (B, OH, OW))
    return img, y0, x0


def check_span(y0, x0):
    """Fail loudly if any block violates the kernel's window invariants
    (the kernel silently emits zeros for out-of-window pixels)."""
    nrb, ncb = OH // ROWS, OW // COLS
    y = np.asarray(y0).reshape(B, nrb, ROWS, ncb, COLS)
    x = np.asarray(x0).reshape(B, nrb, ROWS, ncb, COLS)
    rorg = np.clip(y.min(axis=(2, 4)) // RWIN, 0, HP // RWIN - 2) * RWIN
    corg = np.clip(x.min(axis=(2, 4)) // COLS, 0, WP // COLS - 2) * COLS
    yspan = (y.max(axis=(2, 4)) - rorg).max()
    xspan = (x.max(axis=(2, 4)) - corg).max()
    assert yspan + 1 <= RLOOP - 1, f"row span {yspan + 1} > {RLOOP - 1}"
    assert xspan + 1 <= 2 * COLS - 1, f"col span {xspan + 1}"


def slope_time(fn, inputs, reps=6):
    """Device-time slope with NO input tuple repeated across (or within)
    passes — the relay can replay byte-identical calls (CLAUDE.md)."""
    def drain(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    n_lo, n_hi = 2, 2 + reps
    assert len(inputs) >= 1 + n_lo + n_hi
    drain(fn(*inputs[0]))

    def run(n, pool):
        t0 = time.time()
        outs = [fn(*pool[i]) for i in range(n)]
        drain(outs[-1])
        return (time.time() - t0) * 1e3

    t_hi = run(n_hi, inputs[1:1 + n_hi])
    t_lo = run(n_lo, inputs[1 + n_hi:1 + n_hi + n_lo])
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    interp = (pltpu.force_tpu_interpret_mode()
              if os.environ.get("PROBE_INTERPRET") else
              contextlib.nullcontext())
    with interp:
        _main()


def _main():
    print("backend:", jax.default_backend(), flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 11)
    inputs = [tuple(jax.block_until_ready(v) for v in make_inputs(k))
              for k in keys]
    for inp in inputs:
        check_span(inp[1], inp[2])

    t0 = time.time()
    out_p = jax.block_until_ready(pallas_patch_gather(*inputs[0]))
    print(f"pallas compile+run: {time.time() - t0:.1f}s", flush=True)
    out_x = jax.block_until_ready(xla_patch_gather(*inputs[0]))
    op, ox = np.asarray(out_p), np.asarray(out_x)
    match = np.array_equal(op, ox)
    print("exact match:", match)
    if not match:
        bad = np.argwhere(op != ox)
        print("mismatches:", bad.shape[0], "first:", bad[:5])
        for i in bad[:5]:
            print(tuple(i), "pallas", op[tuple(i)], "xla", ox[tuple(i)])

    tp = slope_time(pallas_patch_gather, inputs)
    tx = slope_time(xla_patch_gather, inputs)
    n = B * OH * OW
    print(f"pallas: {tp:.2f} ms  ({tp * 1e6 / n:.2f} ns/lookup)")
    print(f"xla:    {tx:.2f} ms  ({tx * 1e6 / n:.2f} ns/lookup)")
    print(f"speedup: {tx / tp:.2f}x")


if __name__ == "__main__":
    main()
