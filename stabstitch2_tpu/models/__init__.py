"""Model families (the reference's L1 layer) as Flax linen modules.

SpatialNet / TemporalNet / SmoothNet mirror the reference's architectures
parameter-for-parameter (so reference ``.pth`` checkpoints convert
losslessly via ``stabstitch2_tpu.utils.torch_import``), but run NHWC with a
configurable compute dtype (bf16 on TPU) and are shape-generic.
"""

from stabstitch2_tpu.models.backbone import ResNetStage1, ResNetStage2
from stabstitch2_tpu.models.spatial import SpatialNet
from stabstitch2_tpu.models.temporal import TemporalNet
from stabstitch2_tpu.models.smooth import SmoothNet
from stabstitch2_tpu.models.vgg import VGG19Features

__all__ = [
    "ResNetStage1",
    "ResNetStage2",
    "SpatialNet",
    "TemporalNet",
    "SmoothNet",
    "VGG19Features",
]
