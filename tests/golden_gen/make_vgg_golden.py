"""Golden fixture for the VGG-19 relu3_2 perceptual trunk.

Builds a torch Sequential with torchvision vgg19.features layout up to
index 13 (relu3_2) — the slice the reference's perceptual loss executes
(SpatialWarp/Codes/loss.py:9-26) — with random weights, and records
state_dict (torchvision key naming) + input/output. Tests convert via
utils.torch_import.vgg19_mapping and assert VGG19Features parity,
including the fixed channel-mean subtraction.

Usage: python tests/golden_gen/make_vgg_golden.py
"""

import pathlib

import numpy as np
import torch
import torch.nn as nn

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"

VGG_MEAN = (123.6800, 116.7790, 103.9390)


def main():
    torch.manual_seed(31)
    rng = np.random.default_rng(3100)
    features = nn.Sequential(
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
    )
    features.eval()
    x = rng.uniform(0, 255, (2, 3, 64, 80)).astype(np.float32)
    mean = torch.tensor(VGG_MEAN).reshape(1, 3, 1, 1)
    with torch.no_grad():
        y = features(torch.tensor(x) - mean).numpy()
    sd = {f"features.{k}": v.numpy() for k, v in features.state_dict().items()}
    np.savez(OUT / "vgg_parity.npz", x=x, y=y,
             **{f"sd::{k}": v for k, v in sd.items()})
    print("vgg_parity.npz", y.shape)


if __name__ == "__main__":
    main()
