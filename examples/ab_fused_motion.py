"""Wall-clock A/B on the real chip: eager-chunked vs fused motion phase.

VERDICT round-3 #4: the two-view BULK default keeps the eager chunked
motion drivers (dispatches interleave with uploads) even though the fused
program is ~35 ms/video cheaper on-device. This measures what actually
matters — wall time — for both modes in the SAME session, interleaved
A/B/A/B so relay weather hits both equally, for both single-video latency
and the sustained pipelined rate.

  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/ab_fused_motion.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.data.video_io import bgr_to_i420
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher
    from synthetic import make_two_view_clip

    frames = int(os.environ.get("AB_FRAMES", "48"))
    num_videos = int(os.environ.get("AB_VIDEOS", "4"))
    reps = int(os.environ.get("AB_REPS", "3"))
    clips = [make_two_view_clip(num_frames=frames, height=360, width=480,
                                overlap=0.55, shake_px=3.0, seed=3 + i)
             for i in range(num_videos)]
    st = init_stitcher(rng_seed=0, chunk=8,
                       config=StitchConfig(fusion_mode="AVERAGE",
                                           warp_mode="NORMAL",
                                           download_format="yuv420"))
    pack = bgr_to_i420

    # warm both program sets
    for mode in (False, True):
        st.fused_motion = mode
        for v1, v2 in clips:
            st.stitch_arrays(pack(v1), None, pack(v2), None)

    def single(mode):
        st.fused_motion = mode
        st.sync_phases = True
        v1, v2 = clips[1]
        t0 = time.time()
        st.stitch_arrays(pack(v1), None, pack(v2), None)
        return frames / (time.time() - t0)

    def sustained(mode):
        st.fused_motion = mode
        st.sync_phases = False
        t0 = time.time()
        t_first, done = None, 0
        in_flight = None

        def collect(p):
            nonlocal t_first, done
            n = len(st.stitch_finish(p).frames)
            if t_first is None:
                t_first = time.time()
            else:
                done += n

        for v1, v2 in clips:
            pending = st.stitch_begin(pack(v1), None, pack(v2), None)
            if in_flight is not None:
                collect(in_flight)
            in_flight = pending
        collect(in_flight)
        return (done / (time.time() - t_first) if done
                else num_videos * frames / (time.time() - t0))

    results = {("single", m): [] for m in (False, True)}
    results.update({("sustained", m): [] for m in (False, True)})
    for _ in range(reps):
        for mode in (False, True):
            results[("single", mode)].append(single(mode))
        for mode in (False, True):
            results[("sustained", mode)].append(sustained(mode))

    for kind in ("single", "sustained"):
        for mode in (False, True):
            vals = results[(kind, mode)]
            name = "fused" if mode else "eager"
            print(f"{kind:9s} {name:5s}: best {max(vals):6.2f} fps  "
                  f"all {[round(v, 2) for v in vals]}")


if __name__ == "__main__":
    main()
