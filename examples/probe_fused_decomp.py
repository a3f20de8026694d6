"""Chip decomposition of the window-gather composite's 9.5 ms/chunk.

Round-4 verdict item 1 asks for a fused composite kernel (TPS coords +
window gather + combine in ONE program). Before designing it, measure
where the current three-program chain actually spends its time at the
production shape (B=16 stacked views, 384x544 canvas):

  coords   : tps_coords_fused Pallas kernel alone
  weights  : the XLA epilogue between the kernels (_patch_weights_idx +
             support mask + window-origin reductions + pads)
  gather   : _patch_gather_planes Mosaic kernel alone (4 int32 planes)
  gather8  : same kernel rebuilt with NT=8 (half the window DMAs) —
             separates DMA-issue cost from row-loop compute
  combine  : unpack + weighted accumulate + fusion + clip (XLA)
  full     : _composite_chunk bgr, pallas_gather=True (the 9.5 ms ref)

Also smoke-tests a pl.Element dynamic-offset window BlockSpec (scalar-
prefetched element origins) — the capability the fused kernel would use
to fetch the whole 144x384 window as ONE spec instead of 48 tiles.

Run on the real chip (default env):
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/probe_fused_decomp.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stabstitch2_tpu.ops import pallas_gather as pg
    from stabstitch2_tpu.ops.interp import (_combine_patch_u8,
                                            _patch_weights_idx, pack_bgr_u8)
    from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                          rigid_mesh)
    from stabstitch2_tpu.ops.pallas_warp import tps_coords_fused
    from stabstitch2_tpu.ops.tps import tps_params
    from stabstitch2_tpu.pipeline.compositor import _composite_chunk
    from stabstitch2_tpu.config import StitchConfig

    chunk = 8
    H, W = 360, 480
    PAD_H, PAD_W = 384, 544
    cfg = StitchConfig()
    offset = jnp.asarray([-10.0, -10.0], jnp.float32)
    reps = 5
    keys = jax.random.split(jax.random.PRNGKey(3), 64)

    @jax.jit
    def chunk_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        i1 = jax.random.randint(k1, (chunk, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        i2 = jax.random.randint(k2, (chunk, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        xs, ys = jnp.linspace(0.0, W, 9), jnp.linspace(0.0, H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        m1 = base + jax.random.normal(k3, (chunk, 7, 9, 2)) * 2.0
        m2 = base + jax.random.normal(k4, (chunk, 7, 9, 2)) * 2.0 + 30.0
        return i1, i2, m1, m2

    ci = {i: jax.block_until_ready(chunk_inputs(keys[i]))
          for i in range(reps + 2)}

    # mirror _composite_chunk's geometry to produce T/source per input set
    @jax.jit
    def geom(m1, m2):
        span_h, span_w = PAD_H - 4, PAD_W - 4
        norm1 = mesh_points(normalize_mesh(m1 - offset, span_h, span_w))
        norm2 = mesh_points(normalize_mesh(m2 - offset, span_h, span_w))
        rigid = rigid_mesh(H, W, dtype=jnp.float32)
        nrig = jnp.broadcast_to(
            mesh_points(normalize_mesh(rigid, H, W))[None], norm1.shape)
        source = jnp.concatenate([norm1, norm2], 0)
        target = jnp.concatenate([nrig, nrig], 0)
        return tps_params(source, target), source

    TS = {i: jax.block_until_ready(geom(ci[i][2], ci[i][3]))
          for i in range(reps + 2)}

    coords_jit = jax.jit(functools.partial(
        tps_coords_fused, out_size=(PAD_H, PAD_W),
        grid_span=(PAD_H - 4, PAD_W - 4)))

    XS = {i: jax.block_until_ready(coords_jit(*TS[i]))
          for i in range(reps + 2)}

    oh, ow = PAD_H, PAD_W

    @jax.jit
    def weights_epilogue(stack_img, x_s, y_s):
        """Everything the v2 wrapper runs between the two kernels."""
        B = stack_img.shape[0]
        packed = pack_bgr_u8(stack_img)
        HP = max(-(-(H + 1) // pg.RWIN) * pg.RWIN, pg.NT * pg.RWIN)
        WP = max(-(-(W + 1) // pg.COLS) * pg.COLS + (pg.NCT - 1) * pg.COLS,
                 pg.NCT * pg.COLS)
        padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 1)), mode="edge")
        padded = jnp.pad(padded,
                         ((0, 0), (0, HP - (H + 1)), (0, WP - (W + 1))))
        wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x_s, y_s, H, W)
        live2 = ((wa + wb + wc + wd) > 0).reshape(B, oh, ow)
        OHp = -(-oh // pg.ROWS) * pg.ROWS
        OWp = -(-ow // pg.COLS) * pg.COLS
        y2 = y0i.reshape(B, oh, ow)
        x2 = x0i.reshape(B, oh, ow)
        if (OHp, OWp) != (oh, ow):
            y2 = jnp.pad(y2, ((0, 0), (0, OHp - oh), (0, OWp - ow)),
                         mode="edge")
            x2 = jnp.pad(x2, ((0, 0), (0, OHp - oh), (0, OWp - ow)),
                         mode="edge")
            live2 = jnp.pad(live2, ((0, 0), (0, OHp - oh), (0, OWp - ow)))
        return padded, y2, x2, live2, (wa, wb, wc, wd)

    WE = {}
    for i in range(reps + 2):
        i1, i2, _, _ = ci[i]
        stack = jnp.concatenate([i1, i2], 0)
        WE[i] = jax.block_until_ready(
            weights_epilogue(stack, XS[i][0], XS[i][1]))

    gather_jit = functools.partial(pg._patch_gather_planes, interpret=False)
    PL = {i: jax.block_until_ready(gather_jit(*WE[i][:4]))
          for i in range(reps + 2)}

    @jax.jit
    def combine_tail(planes, bad, live2, ws):
        wa, wb, wc, wd = ws
        B = planes.shape[0]
        pl_ = planes[:, :, :oh, :ow].reshape(B, 4, oh * ow)
        badf = bad[:, :oh, :ow].reshape(B, oh * ow)
        livef = live2[:, :oh, :ow].reshape(B, oh * ow)
        keep = jnp.where(livef & ~badf, jnp.float32(1), jnp.float32(0))
        out = _combine_patch_u8(pl_[:, 0], pl_[:, 2], pl_[:, 1], pl_[:, 3],
                                wa * keep, wb * keep, wc * keep, wd * keep,
                                jnp.float32)
        out = out.reshape(B, oh, ow, 3)
        w1, w2 = out[:B // 2], out[B // 2:]
        fused = jnp.clip((w1 + w2) / 2.0 * 2.0
                         / jnp.maximum((w1 > 0) * 1.0 + (w2 > 0) * 1.0, 1.0),
                         0, 255)
        return fused.astype(jnp.uint8)

    def _drain(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def timeit(fn):
        _drain(fn(0))

        def run(n):
            t0 = time.time()
            outs = [fn(1 + (i % reps)) for i in range(n)]
            _drain(outs[-1])
            return (time.time() - t0) * 1e3

        n_lo, n_hi = 2, 2 + reps
        return (run(n_hi) - run(n_lo)) / (n_hi - n_lo)

    results = {}
    results["coords"] = timeit(lambda i: coords_jit(*TS[i]))
    results["weights"] = timeit(lambda i: weights_epilogue(
        jnp.concatenate([ci[i][0], ci[i][1]], 0), XS[i][0], XS[i][1]))
    results["gather"] = timeit(lambda i: gather_jit(*WE[i][:4]))
    results["combine"] = timeit(lambda i: combine_tail(
        PL[i][0], PL[i][1], WE[i][3], WE[i][4]))

    def comp_full(i):
        i1, i2, m1, m2 = ci[i]
        return _composite_chunk(i1, i2, m1, m2, offset, (PAD_H, PAD_W),
                                cfg.warp_mode, cfg.fusion_mode,
                                grid_span=(PAD_H - 4, PAD_W - 4),
                                out_format="bgr",
                                coord_stride=cfg.coord_stride,
                                pallas_gather=True)

    results["full"] = timeit(comp_full)

    # NT=8 rebuild: half the per-block window DMAs (budget shrinks; bad
    # flags may fire — timing only)
    old = (pg.NT, pg.Y_BUDGET)
    pg.NT = 8
    pg.Y_BUDGET = pg.NT * pg.RWIN - 2
    pg._patch_gather_planes.clear_cache()
    try:
        results["gather_nt8"] = timeit(lambda i: gather_jit(*WE[i][:4]))
    finally:
        pg.NT, pg.Y_BUDGET = old
        pg._patch_gather_planes.clear_cache()

    for k, v in results.items():
        print(f"{k:10s}: {v:7.2f} ms/chunk")

    # ---- pl.Element dynamic-offset window smoke test ----
    WIN_H, WIN_W = 32, 256

    def ekernel(roff_ref, coff_ref, win_ref, o_ref):
        o_ref[:] = win_ref[:WIN_H // 4, :WIN_W // 2]

    B = 4
    src = jnp.arange(B * 512 * 640, dtype=jnp.int32).reshape(B, 512, 640)
    # origins in TILE units (x8 / x128 inside the index map): Mosaic must
    # PROVE the element offset divides the (8, 128) tiling — a raw dynamic
    # scalar fails with "Couldn't prove that tiling (8) divides index"
    roff = jnp.asarray([1, 8, 16, 32], jnp.int32)
    coff = jnp.asarray([0, 1, 2, 3], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(WIN_H), pl.Element(WIN_W)),
            lambda b, r, c: (b, r[b] * 8, c[b] * 128),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, WIN_H // 4, WIN_W // 2),
                               lambda b, r, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    try:
        out = pl.pallas_call(
            ekernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, WIN_H // 4, WIN_W // 2),
                                           jnp.int32),
        )(roff, coff, src)
        out = np.asarray(out)
        want = np.stack([np.asarray(src)[
            b, int(roff[b]) * 8:int(roff[b]) * 8 + WIN_H // 4,
            int(coff[b]) * 128:int(coff[b]) * 128 + WIN_W // 2]
            for b in range(B)])
        print("element window smoke:",
              "OK" if (out == want).all() else "MISMATCH")
    except Exception as e:
        print(f"element window smoke: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
