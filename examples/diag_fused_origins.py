"""Diagnose the fused kernel's window-origin ESTIMATES on real meshes.

The fused composite (ops/pallas_fused.py) places each block's source
window from a coarse block-corner lattice + margins; a live pixel the
placed window misses is exact-zeroed + flagged, and the whole chunk
repairs through XLA (correct, 4x slower). This drives the REAL pipeline
(motion + smooth on a synthetic clip, like diag_gather_violation) and
reports, per side, how far live corners fall outside the placed
windows — the data margin/window sizing rests on.

Env: DIAG_H/DIAG_W input size, DIAG_FRAMES, DIAG_SEED.
Run on chip (default env) or CPU (PYTHONPATH trick, slower).
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
    from stabstitch2_tpu.ops import pallas_fused as pf
    from stabstitch2_tpu.ops.interp import _patch_weights_idx
    from stabstitch2_tpu.ops.mesh import (mesh_points, normalize_mesh,
                                          rigid_mesh)
    from stabstitch2_tpu.ops.precision import HIGHEST
    from stabstitch2_tpu.ops.tps import (_eval_grid_rows, _span_step,
                                         tps_params, tps_sample_coords)
    from stabstitch2_tpu.pipeline import compositor as comp
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher
    from synthetic import make_two_view_clip

    frames = int(os.environ.get("DIAG_FRAMES", "16"))
    H = int(os.environ.get("DIAG_H", "360"))
    W = int(os.environ.get("DIAG_W", "480"))
    seed = int(os.environ.get("DIAG_SEED", "7"))
    v1, v2 = make_two_view_clip(num_frames=frames, height=H, width=W,
                                overlap=0.55, shake_px=3.0 * H / 360.0,
                                seed=seed)
    cfg = StitchConfig(fusion_mode="AVERAGE", warp_mode="NORMAL",
                       download_format="bgr",
                       max_canvas_h=max(1024, 2 * H),
                       max_canvas_w=max(1280, 2 * W))
    st = init_stitcher(rng_seed=0, chunk=8, config=cfg)
    pend = st.stitch_begin(bgr_to_i420(v1), None, bgr_to_i420(v2), None)
    sm1 = pend.smooth["smooth_mesh1"]
    sm2 = pend.smooth["smooth_mesh2"]
    st.stitch_finish(pend)

    mh, mw = st.model_h, st.model_w
    scale = jnp.asarray([W / mw, H / mh], jnp.float32)
    hi1, hi2 = sm1 * scale, sm2 * scale
    canvas = comp.compute_canvas(hi1, hi2, cfg.canvas_bucket)
    offset = jnp.asarray([canvas.x_min, canvas.y_min], jnp.float32)
    oh, ow = canvas.pad_h, canvas.pad_w
    span_h, span_w = canvas.out_h, canvas.out_w
    print(f"canvas {span_h}x{span_w} pad {oh}x{ow}")

    nt, nct = pf.fused_window_tiles(H, W)
    ROWS, COLS, RWIN = pf.ROWS, pf.COLS, pf.RWIN
    HP = max(-(-(H + 1) // RWIN) * RWIN, nt * RWIN)
    WP = max(-(-(W + 1) // COLS) * COLS + (nct - 1) * COLS, nct * COLS)
    print(f"window {nt * RWIN}x{nct * COLS} margins "
          f"y={pf.MARGIN_Y} x={pf.MARGIN_X}")

    worst = {k: 0 for k in ("y_low", "y_high", "x_low", "x_high")}
    tot_bad = tot_live = 0
    bad_chunks = 0
    for s0 in range(0, frames, 8):
        B = min(8, frames - s0)
        m1, m2 = hi1[s0:s0 + B], hi2[s0:s0 + B]
        norm1 = mesh_points(normalize_mesh(m1 - offset, span_h, span_w))
        norm2 = mesh_points(normalize_mesh(m2 - offset, span_h, span_w))
        rigid = rigid_mesh(H, W, dtype=jnp.float32)
        nrig = jnp.broadcast_to(
            mesh_points(normalize_mesh(rigid, H, W))[None], norm1.shape)
        source = jnp.concatenate([norm1, norm2], 0)
        target = jnp.concatenate([nrig, nrig], 0)
        T = tps_params(source, target)
        x_s, y_s = tps_sample_coords(T, source, (oh, ow),
                                     grid_span=(span_h, span_w))
        wa, wb, wc, wd, y0i, x0i = _patch_weights_idx(x_s, y_s, H, W)
        BB = y0i.shape[0]
        OHp = -(-oh // ROWS) * ROWS
        OWp = -(-ow // COLS) * COLS
        nrb, ncb = OHp // ROWS, OWp // COLS

        def blockpad(a, fill):
            a = np.asarray(a).reshape(BB, oh, ow)
            return np.pad(a, ((0, 0), (0, OHp - oh), (0, OWp - ow)),
                          constant_values=fill)

        live = blockpad((np.asarray(wa + wb + wc + wd) > 0), 0) > 0
        y2 = blockpad(y0i, 0)
        x2 = blockpad(x0i, 0)

        # the wrapper's ACTUAL origin computation (shared helper)
        from stabstitch2_tpu.ops.tps import _span_step as _ss
        step_x = _ss(jnp.float32(span_w), jnp.float32)
        step_y = _ss(jnp.float32(span_h), jnp.float32)
        roff_t, coff_t = pf.window_origins(
            T, source, nrb, ncb, (H, W), (HP, WP), nt, nct, step_x, step_y)
        roff = np.asarray(roff_t) * RWIN
        coff = np.asarray(coff_t) * COLS

        def expand(v):
            return np.repeat(np.repeat(v, ROWS, 1), COLS, 2)

        y0l = y2 - expand(roff)
        x0l = x2 - expand(coff)
        bad = live & ((y0l < 0) | (y0l > nt * RWIN - 2)
                      | (x0l < 0) | (x0l > nct * COLS - 2))
        if bad.any():
            bad_chunks += 1
            worst["y_low"] = max(worst["y_low"],
                                 int(np.where(live, -y0l, 0).max()))
            worst["y_high"] = max(worst["y_high"], int(np.where(
                live, y0l - (nt * RWIN - 2), 0).max()))
            worst["x_low"] = max(worst["x_low"],
                                 int(np.where(live, -x0l, 0).max()))
            worst["x_high"] = max(worst["x_high"], int(np.where(
                live, x0l - (nct * COLS - 2), 0).max()))
        tot_bad += int(bad.sum())
        tot_live += int(live.sum())

    print(f"bad chunks: {bad_chunks}/{-(-frames // 8)}, bad px: {tot_bad} "
          f"of {tot_live} live ({tot_bad / max(tot_live, 1):.2e})")
    print("worst shortfall px:", worst)


if __name__ == "__main__":
    main()
