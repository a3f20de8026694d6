"""Round-3 TPU soak: every production path on the real chip, varied shapes.

Covers the paths that changed this round: traced-span composites across
varied canvas extents, fused metric program across length buckets, N-view
begin/finish, fused-motion two-view stitching, upload/download format
combos, odd dimensions, and the online streaming loop. Prints one PASS
line per case; any exception fails the soak.

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python examples/soak_round3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import numpy as np

    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.data.video_io import bgr_to_i420
    from stabstitch2_tpu.metrics import harness
    from stabstitch2_tpu.pipeline import threeview as tv
    from stabstitch2_tpu.pipeline.online import OnlineStitcher
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher
    from synthetic import make_two_view_clip

    t_all = time.time()
    passed = 0

    def ok(name, t0):
        nonlocal passed
        passed += 1
        print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)

    # one stitcher per download format (shared programs within each)
    st_bgr = init_stitcher(rng_seed=0, chunk=8,
                           config=StitchConfig(download_format="bgr"))
    st_yuv = init_stitcher(rng_seed=0, chunk=8,
                           config=StitchConfig(download_format="yuv420"))

    # --- two-view stitch matrix: hi size x length x upload x fused -------
    cases = [
        # (hi_h, hi_w, T, i420_upload, fused, stitcher)
        (360, 480, 7, False, False, st_bgr),    # minimum window
        (360, 480, 23, True, False, st_yuv),    # odd length, thin formats
        (240, 320, 20, True, True, st_yuv),     # small frames, fused
        (243, 321, 9, False, False, st_bgr),    # odd dims (no 4:2:0 pack)
        (720, 960, 9, True, False, st_yuv),     # hi-res frames, model 360
        (360, 480, 49, True, True, st_yuv),     # long video, fused
    ]
    for hh, ww, T, i420, fused, st in cases:
        t0 = time.time()
        v1, v2 = make_two_view_clip(num_frames=T, height=hh, width=ww,
                                    seed=T + hh)
        if i420:
            v1, v2 = bgr_to_i420(v1), bgr_to_i420(v2)
        st.fused_motion = fused
        r = st.stitch_arrays(v1, None, v2, None)
        assert r.frames.shape[0] == T, r.frames.shape
        assert np.isfinite(r.frames.astype(np.float32)).all()
        assert r.frames.max() > 10  # non-degenerate content
        ok(f"stitch {hh}x{ww} T={T} i420={i420} fused={fused} "
           f"fmt={r.frame_format} canvas={r.canvas.out_w}x{r.canvas.out_h}",
           t0)
    st_bgr.fused_motion = st_yuv.fused_motion = False

    # --- no_phase_sync mode ---------------------------------------------
    t0 = time.time()
    st_yuv.sync_phases = False
    v1, v2 = make_two_view_clip(num_frames=23, height=360, width=480, seed=1)
    r = st_yuv.stitch_arrays(bgr_to_i420(v1), None, bgr_to_i420(v2), None)
    st_yuv.sync_phases = True
    assert r.frames.shape[0] == 23
    ok("stitch no_phase_sync T=23", t0)

    # --- fused metric program across buckets ----------------------------
    for T in (7, 18, 33, 50):
        t0 = time.time()
        v1, v2 = make_two_view_clip(num_frames=T, height=360, width=480,
                                    seed=100 + T)
        m = harness.evaluate_video(st_bgr, v1, v2)  # uint8 path
        assert all(np.isfinite(v) for v in m.values()), m
        ok(f"metric T={T} psnr={m['psnr']:.2f} stab={m['stability']:.2f}",
           t0)

    # --- opt-in I420 metric uploads (0.5 B/px) close to the bgr path ----
    t0 = time.time()
    v1, v2 = make_two_view_clip(num_frames=18, height=360, width=480,
                                seed=118)
    mb = harness.evaluate_video(st_bgr, v1, v2)
    mi = harness.evaluate_video(st_bgr, v1, v2, upload="i420")
    assert abs(mi["psnr"] - mb["psnr"]) < 0.7, (mi["psnr"], mb["psnr"])
    ok(f"metric upload=i420 dpsnr={mi['psnr'] - mb['psnr']:+.3f}", t0)

    # --- N-view begin/finish, 3 and 4 views -----------------------------
    from bench_stitch_multi import make_three_view_clip

    for V, T in ((3, 16), (4, 11)):
        t0 = time.time()
        views = make_three_view_clip(T, 360, 480, seed=V)
        if V == 4:  # reuse view 1 shifted as a 4th view
            views = views + [views[1]]
        frames, fmt = tv.stitch_multi_finish(
            tv.stitch_multi_begin(st_yuv, [bgr_to_i420(v) for v in views]))
        assert frames.shape[0] == T
        assert np.isfinite(frames.astype(np.float32)).all()
        ok(f"stitch-multi V={V} T={T} fmt={fmt} out={frames.shape}", t0)

    # --- online streaming loop ------------------------------------------
    t0 = time.time()
    online = OnlineStitcher(st_bgr, emit_format="i420")
    v1, v2 = make_two_view_clip(num_frames=12, height=360, width=480, seed=9)
    emitted = []
    for t in range(12):
        emitted.extend(online.push(v1[t], v2[t]))
    assert len(emitted) == 12, len(emitted)
    ok(f"online push x12 (reanchors={online.reanchor_frames})", t0)

    print(f"SOAK OK: {passed} cases in {time.time() - t_all:.0f}s")


if __name__ == "__main__":
    main()
