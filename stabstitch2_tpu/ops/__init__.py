"""Geometry / warp kernel library (the reference's L0 layer, rebuilt for TPU).

Pure jittable functions; everything is batched and differentiable. The
reference keeps four near-identical copies of these kernels
(*/Codes/utils/); here there is exactly one implementation of each.
"""

from stabstitch2_tpu.ops.mesh import (
    rigid_mesh,
    normalize_mesh,
    denormalize_mesh,
    h2mesh,
    apply_homography_points,
)
from stabstitch2_tpu.ops.dlt import solve_dlt
from stabstitch2_tpu.ops.interp import bilinear_sample, grid_sample_align_corners
from stabstitch2_tpu.ops.homography import homo_warp, normalize_homography
from stabstitch2_tpu.ops.tps import (
    tps_params,
    tps_warp,
    tps_sample_coords,
    tps_transform_points,
)
from stabstitch2_tpu.ops.cost_volume import cost_volume, ccl_flow

__all__ = [
    "rigid_mesh",
    "normalize_mesh",
    "denormalize_mesh",
    "h2mesh",
    "apply_homography_points",
    "solve_dlt",
    "bilinear_sample",
    "grid_sample_align_corners",
    "homo_warp",
    "normalize_homography",
    "tps_params",
    "tps_warp",
    "tps_sample_coords",
    "tps_transform_points",
    "cost_volume",
    "ccl_flow",
]
