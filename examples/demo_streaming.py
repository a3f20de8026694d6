"""Demo: true streaming stitching — push frame pairs, collect panoramas.

Usage:  python examples/demo_streaming.py [out_dir]

Simulates a synchronized two-camera stream with synthetic shaky clips and
feeds them frame-by-frame through OnlineStitcher (6-frame emission
latency, causal re-anchoring canvas, one fused device step per frame).
Writes the emitted panoramas as an mp4. Models are randomly initialized
(no released checkpoints in this environment); with a converted reference
triad build the stitcher via utils.checkpoint.stitcher_from_checkpoint.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from synthetic import make_two_view_clip
from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.data.video_io import write_video
from stabstitch2_tpu.pipeline.online import OnlineStitcher
from stabstitch2_tpu.pipeline.stitcher import init_stitcher


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stabstitch_streaming"
    os.makedirs(out, exist_ok=True)
    T, H, W = 24, 360, 480
    v1, v2 = make_two_view_clip(num_frames=T, height=H, width=W,
                                overlap=0.6, shake_px=2.0, seed=7)

    st = init_stitcher(rng_seed=0, config=StitchConfig(fusion_mode="LINEAR"))
    # emit_format='i420' returns encoder-native packed 4:2:0 frames (half
    # the device->host bytes — the right choice when feeding an encoder)
    online = OnlineStitcher(st, emit_format="i420")

    def run_pass():
        online.reset()
        emitted, lat = [], []
        for t in range(T):
            t0 = time.time()
            outs = online.push(v1[t], v2[t])
            lat.append((time.time() - t0) * 1e3)
            emitted.extend(outs)
        return emitted, lat

    emitted, lat = run_pass()       # cold: includes compiles
    emitted, lat = run_pass()       # warm: the numbers that matter

    write_video(os.path.join(out, "streamed.mp4"), np.stack(emitted),
                frame_format="i420")
    window = online.s.config.window
    steady = lat[window + 1:] or lat
    print(f"emitted {len(emitted)}/{T} panoramas "
          f"(latency {window - 1} frames by construction)")
    print(f"first-window burst (push #{window}, emits {window} frames): "
          f"{lat[window - 1]:.0f} ms")
    print(f"steady push wall time: median {np.median(steady):.0f} ms")
    if online.reanchor_frames:
        print("canvas re-anchored at frames:", online.reanchor_frames)
    print("outputs in", out)


if __name__ == "__main__":
    main()
