"""Demo: generate a synthetic two-view shaky clip and stitch it.

Usage:  python examples/demo_synthetic.py [out_dir]

Writes the input views, the stitched mp4 (LINEAR fusion), and a middle-frame
panorama PNG. Models are randomly initialized (no released checkpoints in
this environment); with a converted reference triad pass --ckpt_dir.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

from synthetic import write_clip_dirs
from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.pipeline.stitcher import init_stitcher


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stabstitch_demo"
    vd = write_clip_dirs(out, num_frames=24, height=360, width=480, seed=7)
    st = init_stitcher(rng_seed=0, config=StitchConfig(fusion_mode="LINEAR"))
    result = st.stitch_video_dir(vd, os.path.join(out, "stitched.mp4"))
    mid = result.frames[len(result.frames) // 2]
    cv2.imwrite(os.path.join(out, "panorama_mid.png"),
                np.clip(mid, 0, 255).astype(np.uint8))
    print("canvas:", result.canvas)
    print("fps:", {k: round(v, 2) for k, v in result.fps.items()})
    print("outputs in", out)


if __name__ == "__main__":
    main()
