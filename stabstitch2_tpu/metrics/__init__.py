"""Benchmark metric harness (PSNR/SSIM/stability/distortion).

Parity target: Full_model_inference/Codes/test_metric_ssd.py — the script
behind the paper's table (README.md:26-32).
"""

from stabstitch2_tpu.metrics.psnr_ssim import psnr, ssim
from stabstitch2_tpu.metrics.scores import (
    continue_paths,
    stability_score,
    distortion_score,
)

__all__ = ["psnr", "ssim", "continue_paths", "stability_score",
           "distortion_score"]
