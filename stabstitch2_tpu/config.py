"""Configuration for the StabStitch2-TPU framework.

The reference scatters its hyper-parameters across scripts (grid size in
``grid_res.py:3-4``, 360x480 model resolution in every ``dataset.py:13-14``,
loss weights inline in each ``train_*.py``). Here every stage has one
dataclass, and the reference defaults are exposed as the named presets
``ssd`` (StabStitch-D) and ``tra`` (traditional datasets).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Control-point grid resolution: (GRID_H+1) x (GRID_W+1) control points.
# Reference: SpatialWarp/Codes/grid_res.py:3-4 (identical in all 4 packages).
GRID_H = 6
GRID_W = 8

# Model resolution the regression heads are hard-wired to
# (reference FC dims pin 360x480 — SpatialWarp/Codes/network.py:209,250).
MODEL_H = 360
MODEL_W = 480

# Online smoothing window length (reference buffer_len=7,
# Full_model_inference/Codes/test_online_ssd.py:219).
WINDOW = 7


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Geometry constants shared by every stage."""

    grid_h: int = GRID_H
    grid_w: int = GRID_W
    height: int = MODEL_H
    width: int = MODEL_W

    @property
    def mesh_shape(self) -> Tuple[int, int]:
        return (self.grid_h + 1, self.grid_w + 1)

    @property
    def num_points(self) -> int:
        return (self.grid_h + 1) * (self.grid_w + 1)


@dataclasses.dataclass(frozen=True)
class StitchConfig:
    """End-to-end inference configuration.

    Mirrors the reference driver flags
    (Full_model_inference/Codes/test_online_ssd.py:429-444; the reference's
    missing-argument bug at :399 is fixed here by having real defaults).
    """

    grid: GridConfig = GridConfig()
    window: int = WINDOW
    # 'NORMAL' = exact reference interpolation semantics (no black boundary);
    # 'FAST' = grid_sample-style align_corners sampling.
    warp_mode: str = "NORMAL"
    # 'AVERAGE' = intensity-proportional fusion; 'LINEAR' = seam-based blender.
    fusion_mode: str = "AVERAGE"
    # Pad the dynamic output canvas up to multiples of this bucket so the
    # composite kernel compiles once per bucket instead of once per video.
    # 32 keeps the padded-canvas compute waste under ~10% (the warp cost
    # scales with padded pixels); raise it if per-video recompiles hurt.
    canvas_bucket: int = 32
    # Max canvas size (pixels) the compositor will allocate.
    max_canvas_h: int = 1024
    max_canvas_w: int = 1280
    # 'bgr': frames leave the device as uint8 BGR [T,H,W,3].
    # 'yuv420': encoder-native I420 planes [T, H*3//2, W] — half the
    # device->host bytes, exactly what the mp4 writer converts to anyway.
    download_format: str = "bgr"
    # Composite TPS coordinate field: 1 (default) evaluates the spline at
    # every pixel — reference-identical coordinates (torch_tps_transform.py
    # :139-165) — via the fused Pallas coords kernel on TPU. s > 1 is a
    # fast knob: evaluate every s-th pixel and bilinearly upsample
    # (ops/tps.py:tps_sample_coords); at stride 4 coordinates deviate
    # <=0.25 px on realistic smooth meshes
    # (test_geometry.py::TestCoordStride), moving ~28% of output uint8
    # pixels (mean |delta| 0.32). Round-4 chip A/B: the coords are NOT the
    # composite bottleneck (stride 4 saved only ~0.3 ms of a ~26 ms chunk
    # next to the gather), so the default buys exactness for free —
    # BENCHMARKS.md round 4.
    coord_stride: int = 1
    # Composite warp gather backend. None (default) auto-selects: the
    # Mosaic window-gather kernel (ops/pallas_gather.py, ~4x the composite
    # chunk on chip — BENCHMARKS.md round 4) on a single real TPU device,
    # the XLA packed-patch gather everywhere else (CPU; GSPMD meshes,
    # where a bare pallas_call cannot auto-partition). The kernel is
    # exact-or-zero — any live pixel overflowing its source window (never
    # observed on real meshes: live spans measure <=118 rows vs the
    # 126-row budget) is flagged, and composite_finish transparently
    # REPAIRS flagged chunks through the XLA path, so output is always
    # exact. True/False force the choice.
    pallas_gather: Optional[bool] = None
    # ONE-program fused composite warp (ops/pallas_fused.py: TPS eval +
    # window gather + weighted combine in a single Mosaic kernel,
    # round 5). None (default) auto-selects it on TPU for NORMAL-mode
    # uint8 composites at coord_stride 1 — chip A/B: 6.35 ms/chunk bgr
    # vs 9.62 window-gather vs 26.2 XLA; yuv420 as ONE program 7.25 ms
    # vs the round-4 chained pair's 12.90 (BENCHMARKS round 5). Same
    # exact-or-zero + XLA-repair contract as pallas_gather; window
    # shape scales with source resolution (fused_window_tiles), closing
    # the 720p/1080p budget overflow of the fixed v2 window. Takes
    # precedence over pallas_gather when both are enabled.
    pallas_fused: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Shared optimizer recipe (reference: */Codes/train_ssd.py).

    Adam(1e-4, betas=(0.9, 0.999)), exponential LR decay 0.97/epoch,
    global-norm gradient clipping at 3.0 (e.g. SpatialWarp/Codes/train_ssd.py:49-50,122).
    """

    learning_rate: float = 1e-4
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    lr_decay_per_epoch: float = 0.97
    grad_clip_norm: float = 3.0
    batch_size: int = 8
    max_epoch: int = 40


@dataclasses.dataclass(frozen=True)
class SpatialTrainConfig(TrainConfig):
    # ssd: overlap + 10*(inter+intra) per view; no perceptual loss
    # (SpatialWarp/Codes/train_ssd.py:110-118). tra: grid weight 5 and
    # perceptual weight 1e-3 (train_tra.py:112-117).
    grid_weight: float = 10.0
    perception_weight: float = 0.0
    max_epoch: int = 40


@dataclasses.dataclass(frozen=True)
class TemporalTrainConfig(TrainConfig):
    # overlap + 5*inter + 5*intra (TemporalWarp/Codes/train_ssd.py:117-121)
    grid_weight: float = 5.0
    max_epoch: int = 100
    train_frame_num: int = 4  # window to sample the random-gap pair from


@dataclasses.dataclass(frozen=True)
class SmoothTrainConfig(TrainConfig):
    # 1*data + 50*smooth + 10*shape + 1*traj + 0.1*online + 1000*align
    # (SmoothWarp/Codes/train_ssd.py:203)
    data_weight: float = 1.0
    smooth_weight: float = 50.0
    shape_weight: float = 10.0
    trajectory_weight: float = 1.0
    online_weight: float = 0.1
    align_weight: float = 1000.0
    frame_num: int = 7
    train_sqe: int = 2
    train_frame_num: int = 12  # videos shorter than this are skipped
    max_epoch: int = 50


def spatial_train_preset(name: str) -> SpatialTrainConfig:
    if name == "ssd":
        return SpatialTrainConfig()
    if name == "tra":
        return SpatialTrainConfig(grid_weight=5.0, perception_weight=1e-3, max_epoch=80)
    raise ValueError(f"unknown preset {name!r}")


def temporal_train_preset(name: str) -> TemporalTrainConfig:
    if name in ("ssd", "tra"):
        return TemporalTrainConfig()
    raise ValueError(f"unknown preset {name!r}")


def smooth_train_preset(name: str) -> SmoothTrainConfig:
    if name in ("ssd", "tra"):
        return SmoothTrainConfig()
    raise ValueError(f"unknown preset {name!r}")
