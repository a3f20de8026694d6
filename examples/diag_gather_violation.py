"""Diagnose the window-gather invariant violation seen on real stitches.

Round-4 verification found the ops/pallas_gather.py window invariant
firing on a realistic synthetic two-view stitch (CLI run on the chip).
This script reproduces it with the REAL smooth meshes of such a video and
answers, with data:

  1. which canvas blocks violate (how many, where, y-span or x-span);
  2. whether the violating pixels can affect output (nonzero bilinear
     weight sum — out-of-image pixels have w == 0 and clamp harmlessly,
     EXCEPT that weight cancellation needs equal corner values, which the
     clamped window can break);
  3. the actual end-to-end composite delta, Pallas vs XLA gather.

Run on the real chip (default env):
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/diag_gather_violation.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.data.video_io import bgr_to_i420
    from stabstitch2_tpu.ops.interp import _patch_weights_idx
    from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                          rigid_mesh)
    from stabstitch2_tpu.ops.pallas_gather import ROW_SPAN, COLS, ROWS, RWIN
    from stabstitch2_tpu.ops.tps import tps_params, tps_sample_coords
    from stabstitch2_tpu.pipeline import compositor as comp
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher
    from synthetic import make_two_view_clip

    frames = int(os.environ.get("DIAG_FRAMES", "20"))
    v1, v2 = make_two_view_clip(num_frames=frames, height=360, width=480,
                                overlap=0.55, shake_px=3.0, seed=11)
    cfg = StitchConfig(fusion_mode="AVERAGE", warp_mode="NORMAL",
                       download_format="bgr")
    st = init_stitcher(rng_seed=0, chunk=8, config=cfg)

    # run motion+smooth only (internal surface), then mirror
    # _composite_chunk's coords computation to get the raw corner indices
    pend = st.stitch_begin(bgr_to_i420(v1), None, bgr_to_i420(v2), None)
    sm1 = pend.smooth["smooth_mesh1"]
    sm2 = pend.smooth["smooth_mesh2"]
    res = st.stitch_finish(pend)
    print("canvas:", res.canvas.out_h, "x", res.canvas.out_w,
          "pad:", res.canvas.pad_h, "x", res.canvas.pad_w)

    H, W = 360, 480
    mh, mw = st.model_h, st.model_w
    scale = jnp.asarray([W / mw, H / mh], jnp.float32)
    hi1, hi2 = sm1 * scale, sm2 * scale
    canvas = comp.compute_canvas(hi1, hi2, cfg.canvas_bucket)
    offset = jnp.asarray([canvas.x_min, canvas.y_min], jnp.float32)
    oh, ow = canvas.pad_h, canvas.pad_w
    span_h, span_w = canvas.out_h, canvas.out_w

    B = 8
    m1, m2 = hi1[:B], hi2[:B]
    norm1 = mesh_points(normalize_mesh(m1 - offset, span_h, span_w))
    norm2 = mesh_points(normalize_mesh(m2 - offset, span_h, span_w))
    rigid = rigid_mesh(H, W, dtype=jnp.float32)
    nrig = jnp.broadcast_to(
        mesh_points(normalize_mesh(rigid, H, W))[None], norm1.shape)
    source = jnp.concatenate([norm1, norm2], 0)
    target = jnp.concatenate([nrig, nrig], 0)

    @jax.jit
    def coords_and_weights():
        T = tps_params(source, target)
        x_s, y_s = tps_sample_coords(T, source, (oh, ow),
                                     grid_span=(span_h, span_w),
                                     coord_stride=cfg.coord_stride)
        wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x_s, y_s, H, W)
        wsum = jnp.abs(wa) + jnp.abs(wb) + jnp.abs(wc) + jnp.abs(wd)
        return x_s, y_s, y0i, x0i, wsum

    x_s, y_s, y0i, x0i, wsum = jax.device_get(coords_and_weights())
    BB = y0i.shape[0]

    def blockpad(a):
        """Mirror the production wrapper: edge-replicate to the block grid."""
        a = a.reshape(BB, oh, ow)
        OHp = -(-oh // ROWS) * ROWS
        OWp = -(-ow // COLS) * COLS
        return np.pad(a, ((0, 0), (0, OHp - oh), (0, OWp - ow)), mode="edge")

    y2 = blockpad(y0i)
    x2 = blockpad(x0i)
    ws = blockpad(wsum)
    xs2 = blockpad(x_s)
    ys2 = blockpad(y_s)
    ohp, owp = y2.shape[1], y2.shape[2]

    nrb, ncb = ohp // ROWS, owp // COLS
    yb = y2.reshape(BB, nrb, ROWS, ncb, COLS)
    xb = x2.reshape(BB, nrb, ROWS, ncb, COLS)
    wb_ = ws.reshape(BB, nrb, ROWS, ncb, COLS)
    HP = max(-(-(H + 1) // RWIN) * RWIN, 4 * RWIN)
    WP = -(-(W + 1) // COLS) * COLS + COLS
    rorg = np.clip(yb.min(axis=(2, 4)) // RWIN, 0, HP // RWIN - 4)
    corg = np.clip(xb.min(axis=(2, 4)) // COLS, 0, WP // COLS - 2)
    yspan = yb.max(axis=(2, 4)) - rorg * RWIN
    xspan = xb.max(axis=(2, 4)) - corg * COLS
    vio_y = yspan > ROW_SPAN
    vio_x = xspan > 2 * COLS - 2
    print(f"blocks: {BB * nrb * ncb}, y-violating: {vio_y.sum()}, "
          f"x-violating: {vio_x.sum()}")

    # for each violating block: do any pixels with nonzero weight get
    # clamped (i.e. their window-local coord was out of window)?
    harmful = 0
    examples = []
    for b, i, j in zip(*np.nonzero(vio_y | vio_x)):
        yl = yb[b, i, :, j, :] - rorg[b, i, j] * RWIN
        xl = xb[b, i, :, j, :] - corg[b, i, j] * COLS
        clamped = (yl < 0) | (yl > ROW_SPAN) | (xl < 0) | (xl > 2 * COLS - 2)
        w_here = wb_[b, i, :, j, :]
        bad = clamped & (w_here > 1e-6)
        if bad.any():
            harmful += 1
            if len(examples) < 4:
                rr, cc = np.nonzero(bad)
                r0, c0 = rr[0], cc[0]
                examples.append(
                    (int(b), int(i), int(j),
                     float(xs2[b, i * ROWS + r0, j * COLS + c0]),
                     float(ys2[b, i * ROWS + r0, j * COLS + c0]),
                     int(yb[b, i, r0, j, c0]), int(xb[b, i, r0, j, c0]),
                     float(w_here[r0, c0]),
                     int(yspan[b, i, j]), int(xspan[b, i, j])))
    print(f"violating blocks with WEIGHTED clamped pixels: {harmful}")
    for e in examples:
        print("  b=%d blk=(%d,%d) xn=%.4f yn=%.4f y0=%d x0=%d w=%.4f "
              "yspan=%d xspan=%d" % e)

    # --- masked span statistics: what window does REAL data need? -------
    # support: pixels that can produce nonzero output (outside it the four
    # weights cancel pairwise against edge-padded equal corners — exact 0)
    x0f = np.floor((xs2 + 1.0) * (W / 2.0))
    y0f = np.floor((ys2 + 1.0) * (H / 2.0))
    support = ((x0f >= 0) & (y0f >= 0) & (x0f < W - 1) & (y0f < H - 1))
    # true-extent: pixels beyond the video's true canvas are cropped later
    col_ok = np.arange(owp)[None, None, :] < span_w
    row_ok = np.arange(ohp)[None, :, None] < span_h
    live = support & col_ok & row_ok
    lb = live.reshape(BB, nrb, ROWS, ncb, COLS)
    ymin = np.where(lb, yb, 10 ** 6).min(axis=(2, 4))
    ymax = np.where(lb, yb, -1).max(axis=(2, 4))
    xmin = np.where(lb, xb, 10 ** 6).min(axis=(2, 4))
    xmax = np.where(lb, xb, -1).max(axis=(2, 4))
    any_live = lb.any(axis=(2, 4))
    ysp = np.where(any_live, ymax - (ymin // RWIN) * RWIN, 0)
    # x origin quantization is COLS (BlockSpec tile) — spans measured from
    # the 128-quantized origin, like the kernel sees them
    xsp = np.where(any_live, xmax - (xmin // COLS) * COLS, 0)
    for name, sp in (("yspan(+8q)", ysp), ("xspan(+128q)", xsp)):
        v = sp[any_live]
        print(f"{name}: max={v.max()} p99.9={np.percentile(v, 99.9):.0f} "
              f"p99={np.percentile(v, 99):.0f} p95={np.percentile(v, 95):.0f}"
              f" mean={v.mean():.1f}")
    for ntiles in (4, 8, 12, 16):
        vy = (ysp > ntiles * RWIN - 2).sum()
        print(f"  NTILES={ntiles} ({ntiles * RWIN}-row window): "
              f"{vy} violating blocks")
    for nct in (2, 3, 4):
        vx = (xsp > nct * COLS - 2).sum()
        print(f"  NCT={nct} ({nct * COLS}-col window): "
              f"{vx} violating blocks")

    # end-to-end delta on the first chunk, both paths
    i1 = jnp.asarray(v1[:B])
    i2 = jnp.asarray(v2[:B])
    outs = {}
    for pg in (False, True):
        fused, viol = comp._composite_chunk(
            i1, i2, m1, m2, offset, (oh, ow), cfg.warp_mode,
            cfg.fusion_mode, grid_span=(span_h, span_w), out_format="bgr",
            coord_stride=cfg.coord_stride, pallas_gather=pg)
        outs[pg] = (np.asarray(fused), bool(viol))
    ref, got = outs[False][0], outs[True][0]
    print("pallas viol flag:", outs[True][1])
    d = np.abs(ref.astype(np.int16) - got.astype(np.int16))
    print(f"end-to-end delta: max={d.max()} mean={d.mean():.5f} "
          f"frac_nonzero={(d > 0).mean():.6f} "
          f"frac_gt4={(d > 4).mean():.6f}")
    if d.max() > 0:
        bidx, yidx, xidx, _ = np.unravel_index(d.argmax(), d.shape)
        print(f"worst pixel: frame={bidx} y={yidx} x={xidx} "
              f"ref={ref[bidx, yidx, xidx]} got={got[bidx, yidx, xidx]}")
        ys_, xs_ = np.nonzero(d.max(axis=(0, 3)) > 4)
        if len(ys_):
            print(f"diff>4 bbox: y [{ys_.min()},{ys_.max()}] "
                  f"x [{xs_.min()},{xs_.max()}] n={len(ys_)}")


if __name__ == "__main__":
    main()
