"""3-view stitching throughput on the real TPU (round-3 validation).

Synthesizes three overlapping 360x480 views, runs the production
stitch_multi_begin/finish path (uint8 uploads, device-derived lo stream,
yuv420 downloads, two-deep overlap across clips), and prints sustained fps.

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python examples/bench_stitch_multi.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def make_three_view_clip(num_frames, height, width, seed=0):
    import numpy as np

    from synthetic import _texture

    rng = np.random.default_rng(seed)
    pano = _texture(height + 24, width * 2 + 48, seed=seed)
    views = []
    for k in range(3):
        x0 = k * (width // 2)
        frames = []
        for _ in range(num_frames):
            j = rng.integers(0, 12, 2)
            f = pano[j[0]:j[0] + height, x0 + j[1]:x0 + j[1] + width]
            frames.append(f.astype(np.uint8))  # _texture is [H, W, 3]
        views.append(np.stack(frames))
    return views


def main():
    import numpy as np

    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.pipeline import threeview as tv
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher

    frames = int(os.environ.get("BENCH_FRAMES", "48"))
    n_clips = int(os.environ.get("BENCH_VIDEOS", "3"))
    st = init_stitcher(rng_seed=0, chunk=8,
                       config=StitchConfig(download_format="yuv420"))
    clips = [make_three_view_clip(frames, 360, 480, seed=5 + i)
             for i in range(n_clips)]

    # warmup (compiles every program incl. the chain composite bucket)
    t0 = time.time()
    f, fmt = tv.stitch_multi_finish(tv.stitch_multi_begin(st, clips[0]))
    print(f"warmup {time.time() - t0:.1f}s  out={f.shape} fmt={fmt}")

    # sustained: two-deep begin/finish overlap across clips
    t0 = time.time()
    in_flight = None
    done = 0
    for views in clips:
        pending = tv.stitch_multi_begin(st, views)
        if in_flight is not None:
            out, _ = tv.stitch_multi_finish(in_flight)
            done += out.shape[0]
            assert np.isfinite(out.astype(np.float32)).all()
        in_flight = pending
    out, _ = tv.stitch_multi_finish(in_flight)
    done += out.shape[0]
    wall = time.time() - t0
    print(f"3-view sustained: {n_clips} clips x {frames} frames in "
          f"{wall:.1f}s = {done / wall:.2f} fps "
          f"(panorama {out.shape[2]}x{out.shape[1] * 2 // 3})")


if __name__ == "__main__":
    main()
