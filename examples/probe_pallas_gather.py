"""Feasibility probe: VMEM-resident warp gather vs XLA's HBM gather.

The composite's dominant device cost is ONE [B, HW, 4]-int32
take_along_axis at canvas resolution (~23 ms per 16-image chunk,
BENCHMARKS.md round 3b) — XLA lowers it as an HBM gather at ~7 ns per
lookup, ~100x off memory speed-of-light. Hypothesis: a Pallas kernel
that keeps the whole packed source frame resident in VMEM, tiles the
canvas into 8-row blocks, and per block loops over the (small) span of
source rows the block touches — doing per-row LANE gathers
(jnp.take_along_axis axis=1 -> tpu.dynamic_gather, a vector-register
shuffle) gated by row-match masks — is far faster.

Run on the real chip (default env, TPU cache):
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/probe_pallas_gather.py
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

SPAN = 24      # max source-row span one 8-row canvas block may touch
ROWS = 8       # (row origins are quantized to 8 — Mosaic needs sublane
               # slice starts provably 8-aligned — so SPAN covers the
               # true span (<=16) plus up to 7 rows of quantization)

if os.environ.get("PROBE_SMALL"):
    B, H, W = 2, 40, 48
    OH, OW = 48, 64
    HP, WP = 48, 64
else:
    B, H, W = 16, 360, 480      # source frames (packed int32)
    OH, OW = 384, 544           # canvas (already 8/32-aligned)
    HP = 368                    # H+1 edge row, padded to sublane multiple
    WP = OW                     # table width must match the lane width


def _kernel(rorg_ref, img_ref, y0_ref, x0_ref, o_ref, *, span):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = pl.multiple_of(rorg_ref[b, rb], ROWS)
    win = img_ref[0, pl.ds(r0, span + 1), :]       # (span+1, WP)
    x0 = x0_ref[0]                                 # (ROWS, OW) int32
    x1 = x0 + 1
    y0l = y0_ref[0] - r0
    acc00 = jnp.zeros_like(x0)
    acc01 = jnp.zeros_like(x0)
    acc10 = jnp.zeros_like(x0)
    acc11 = jnp.zeros_like(x0)
    for r in range(span + 1):
        row = jnp.broadcast_to(win[r:r + 1, :], x0.shape)
        g0 = jnp.take_along_axis(row, x0, axis=1)
        g1 = jnp.take_along_axis(row, x1, axis=1)
        mt = y0l == r
        mb = y0l == r - 1
        acc00 = jnp.where(mt, g0, acc00)
        acc01 = jnp.where(mt, g1, acc01)
        acc10 = jnp.where(mb, g0, acc10)
        acc11 = jnp.where(mb, g1, acc11)
    o_ref[0, 0] = acc00
    o_ref[0, 1] = acc01
    o_ref[0, 2] = acc10
    o_ref[0, 3] = acc11


@jax.jit
def pallas_patch_gather(img, y0, x0):
    """img: [B, HP, WP] int32; y0/x0: [B, OH, OW] int32 -> [B, 4, OH, OW]."""
    rorg = y0.reshape(B, OH // ROWS, ROWS, OW).min(axis=(2, 3))
    rorg = (rorg // ROWS) * ROWS
    rorg = jnp.clip(rorg, 0, (HP - (SPAN + 1)) // ROWS * ROWS)
    rorg = rorg.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, OH // ROWS),
        in_specs=[
            pl.BlockSpec((1, HP, WP), lambda b, i, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, OW), lambda b, i, s: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, OW), lambda b, i, s: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, ROWS, OW), lambda b, i, s: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, span=SPAN),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, OH, OW), jnp.int32),
    )(rorg, img, y0, x0)


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
    # 8-row block touches < SPAN source rows (the production invariant)
    yy = jnp.arange(OH, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(OW, dtype=jnp.float32)[None, None, :]
    ph = jax.random.uniform(k2, (B, 1, 1), jnp.float32, 0.0, 6.28)
    ys = yy * 0.92 + 3.0 * jnp.sin(xx / OW * 4.0 + ph) + 2.0
    xs = xx * 0.87 + 2.0 * jnp.cos(yy / OH * 5.0 + ph) + 1.0
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y0 = jnp.broadcast_to(y0, (B, OH, OW))
    x0 = jnp.broadcast_to(x0, (B, OH, OW))
    return img, y0, x0


def check_span(y0):
    """Fail loudly if any 8-row block violates the kernel's span invariant.

    The kernel emits zeros (silently) for any canvas pixel whose y0 falls
    outside its block's [r0, r0+SPAN] window; the probe's exact-match check
    only covers the synthetic inputs, so assert the invariant explicitly.
    """
    y = np.asarray(y0).reshape(B, OH // ROWS, ROWS, OW)
    rorg = (y.min(axis=(2, 3)) // ROWS) * ROWS
    rorg = np.clip(rorg, 0, (HP - (SPAN + 1)) // ROWS * ROWS)
    span = y.max(axis=(2, 3)) - rorg
    assert span.max() + 1 <= SPAN, f"block span {span.max() + 1} > {SPAN}"


def slope_time(fn, inputs, reps=6):
    """Device-time slope with NO input tuple repeated across (or within)
    passes — the relay can replay byte-identical calls (CLAUDE.md), which
    would deflate T(n_lo) and inflate the slope."""
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
        check_span(inp[1])

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
