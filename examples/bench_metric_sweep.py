"""Dataset-scale `cli metric` sweep on the real TPU (round-3 validation).

Builds a synthetic dataset of >=10 videos with VARIED lengths (so any
per-length recompile would show up as wall time), evaluates it through the
production harness, and prints per-video wall times + the program-cache
sizes before/after to prove one compiled program set serves every length.

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python examples/bench_metric_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import numpy as np

    from stabstitch2_tpu.metrics import harness
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher
    from synthetic import make_two_view_clip

    n_videos = int(os.environ.get("SWEEP_VIDEOS", "10"))
    # SWEEP_UPLOAD=i420: opt-in 0.5 B/px uploads (see metrics.harness)
    upload = os.environ.get("SWEEP_UPLOAD", "bgr")
    # varied lengths, bounded above so the warmup only compiles a handful
    # of 16-buckets even at dataset scale (SWEEP_VIDEOS=40); the reference
    # test split is 100+ videos of similar per-video length
    max_len = int(os.environ.get("SWEEP_MAX_LEN", "60"))
    spread = max(max_len - 17 + 1, 1)
    lengths = [17 + (3 + 7 * i) % spread for i in range(n_videos)]
    st = init_stitcher(rng_seed=0, chunk=8)

    clips = []
    for i, T in enumerate(lengths):
        v1, v2 = make_two_view_clip(num_frames=T, height=360, width=480,
                                    seed=10 + i)
        clips.append((v1, v2))  # uint8: 1 byte/px uploads, device-normalized

    # warmup: compile the per-bucket program set once (first video of each
    # DISTINCT 16-bucket; lengths within a bucket share programs)
    t0 = time.time()
    seen = set()
    for (lo1, lo2), T in zip(clips, lengths):
        b = -(-T // 16) * 16
        if b not in seen:
            seen.add(b)
            harness.evaluate_video(st, lo1, lo2, upload=upload)
    print(f"warmup (compile, buckets {sorted(seen)}) {time.time() - t0:.1f}s")
    caches = lambda: (st._metric_fused._cache_size(),  # noqa
                      st._smooth_phase._cache_size())
    c0 = caches()

    t0 = time.time()
    total_frames = 0
    for (lo1, lo2), T in zip(clips, lengths):
        tv = time.time()
        m = harness.evaluate_video(st, lo1, lo2, upload=upload)
        total_frames += T
        print(f"  T={T:3d}  {time.time() - tv:6.2f}s  "
              f"psnr={m['psnr']:.2f} stab={m['stability']:.3f}")
    wall = time.time() - t0
    c1 = caches()
    print(f"sweep[{upload}]: {n_videos} videos / {total_frames} frames in {wall:.1f}s "
          f"= {total_frames / wall:.1f} frames/s")
    print(f"program caches before/after sweep: {c0} -> {c1} "
          f"({'NO recompiles' if c0 == c1 else 'RECOMPILED'})")

    # same sweep through the one-deep submit/collect pipeline that
    # evaluate_dataset uses (video k's fetch hides under k+1's upload) —
    # interleaved with the serial pass above for a link-state-fair A/B
    t0 = time.time()
    pending = None
    for (lo1, lo2), T in zip(clips, lengths):
        h = harness._submit_video(st, lo1, lo2, upload=upload)
        if pending is not None:
            harness._collect_video(pending)
        pending = h
    harness._collect_video(pending)
    wall_p = time.time() - t0
    print(f"sweep[{upload}, pipelined]: {total_frames} frames in "
          f"{wall_p:.1f}s = {total_frames / wall_p:.1f} frames/s "
          f"(serial {wall:.1f}s)")


if __name__ == "__main__":
    main()
