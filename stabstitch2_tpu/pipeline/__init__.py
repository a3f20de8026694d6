"""End-to-end online video-stitching pipeline (the reference's L4 drivers,
re-architected as batched jitted stages instead of per-frame python loops).

Stage map (reference: Full_model_inference/Codes/test_online_ssd.py):
  motion    — spatial alignment per frame pair + temporal motion per view
  transport — temporal motions re-expressed in the stitched frame (TPS point)
  smoothing — sliding-window SmoothNet over ALL windows as one batch
  compositor— global canvas, hi-res TPS warps, AVERAGE/LINEAR fusion
  stitcher  — orchestration + video IO
"""

from stabstitch2_tpu.pipeline.stitcher import VideoStitcher, StitchResult

__all__ = ["VideoStitcher", "StitchResult"]
