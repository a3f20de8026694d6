"""Capture the reference checkpoints' full key/shape schemas.

Builds torch modules with exactly the reference's module tree (names +
Sequential indices from SpatialWarp/TemporalWarp/SmoothWarp network.py) and
saves each state_dict's {key: shape}. Tests then prove the converter maps
every key onto our Flax parameter trees.

Usage: python tests/golden_gen/make_ckpt_schema.py
"""

import json
import pathlib

import torch
import torch.nn as nn

from make_model_goldens import TorchBasicBlock, make_conv_head, make_mlp, make_stage1

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"


def make_stage2():
    return nn.Sequential(nn.Sequential(TorchBasicBlock(128, 256, 2),
                                       TorchBasicBlock(256, 256)))


class RefSpatial(nn.Module):
    """Module tree of SpatialWarp/Codes/network.py:180-309."""

    def __init__(self):
        super().__init__()
        self.regressNet1_part1 = make_conv_head(2, (64, 128, 128))
        self.regressNet1_part2 = make_mlp((768, 512, 128, 8))
        self.regressNet2_part1_ref = make_conv_head(121, (64, 128, 128, 256))
        self.regressNet2_part2_ref = make_mlp((1536, 1024, 512, 126))
        self.regressNet2_part1_tgt = make_conv_head(121, (64, 128, 128, 256))
        self.regressNet2_part2_tgt = make_mlp((1536, 1024, 512, 126))
        self.feature_extractor_stage1 = make_stage1()
        self.feature_extractor_stage2 = make_stage2()


class RefTemporal(nn.Module):
    """TemporalWarp/Codes/network.py:118-176 (stage2 defined, unused)."""

    def __init__(self):
        super().__init__()
        self.regressNet2_part1 = make_conv_head(49, (64, 128, 128, 256))
        self.regressNet2_part2 = make_mlp((1536, 1024, 512, 126))
        self.feature_extractor_stage1 = make_stage1()
        self.feature_extractor_stage2 = make_stage2()


class RefSmooth(nn.Module):
    """SmoothWarp/Codes/network.py:184-307 (embedding2 defined, unused)."""

    def __init__(self):
        super().__init__()

        class MP(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding1 = nn.Sequential(nn.Linear(2, 32), nn.ReLU())
                self.embedding2 = nn.Sequential(nn.Linear(1, 8), nn.ReLU())
                self.embedding3 = nn.Sequential(nn.Linear(2, 32), nn.ReLU())
                self.MotionConv3D = nn.Sequential(
                    nn.Conv3d(128, 128, (5, 3, 3), padding=(2, 1, 1)), nn.ReLU(),
                    nn.Conv3d(128, 128, (5, 3, 3), padding=(2, 1, 1)), nn.ReLU(),
                    nn.Conv3d(128, 128, (5, 3, 3), padding=(2, 1, 1)), nn.ReLU())
                self.decoding = nn.Sequential(nn.Linear(128, 4))

        self.MotionPre = MP()


def main():
    schemas = {}
    for name, mod in (("spatial", RefSpatial()), ("temporal", RefTemporal()),
                      ("smooth", RefSmooth())):
        schemas[name] = {k: list(v.shape) for k, v in mod.state_dict().items()}
    with open(OUT / "ckpt_schemas.json", "w") as f:
        json.dump(schemas, f, indent=1, sort_keys=True)
    print("schemas:", {k: len(v) for k, v in schemas.items()})


if __name__ == "__main__":
    main()
