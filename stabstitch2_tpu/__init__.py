"""stabstitch2_tpu — a TPU-native (JAX/XLA/Pallas) video-stitching framework.

Re-implements the full capability surface of StabStitch++ (TPAMI 2025,
reference: nie-lang/StabStitch2) with a TPU-first design:

- geometry core (DLT / homography / thin-plate-spline warps) as pure,
  jittable, differentiable JAX functions (``stabstitch2_tpu.ops``),
- the three model families (SpatialWarp / TemporalWarp / SmoothWarp) as
  Flax modules (``stabstitch2_tpu.models``),
- a batched, scan-based online stitching pipeline (``stabstitch2_tpu.pipeline``),
- unsupervised trainers with the reference's loss recipes (``stabstitch2_tpu.train``),
- metric harness (PSNR/SSIM/stability/distortion) (``stabstitch2_tpu.metrics``),
- multi-chip data/model parallel utilities (``stabstitch2_tpu.parallel``).

Images are NHWC (TPU-native); meshes are ``[..., GRID_H+1, GRID_W+1, 2]``
with ``(x, y)`` point order, matching the reference's conventions.
"""

from stabstitch2_tpu.config import GridConfig, StitchConfig

__version__ = "0.1.0"

__all__ = ["GridConfig", "StitchConfig", "__version__"]
