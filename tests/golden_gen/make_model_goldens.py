"""Golden fixtures for model-block parity and checkpoint conversion.

Builds a torch implementation of the truncated ResNet-18 trunk and the
conv/FC regression heads (my own oracle code, torch.nn only — torchvision
is not installed here), runs them with random weights, and saves the torch
state_dict plus input/output pairs. Tests then convert the state_dict with
``stabstitch2_tpu.utils.torch_import`` and assert the Flax forward matches.

Usage: python tests/golden_gen/make_model_goldens.py
"""

import pathlib

import numpy as np
import torch
import torch.nn as nn

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"
OUT.mkdir(exist_ok=True)
torch.manual_seed(7)


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


def make_stage1():
    """Same structure as the reference's feature_extractor_stage1 Sequential."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(),
        nn.MaxPool2d(3, 2, 1),
        nn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64)),
        nn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128)),
    )


def make_conv_head(cin, stages):
    layers = []
    for feat in stages:
        layers += [nn.Conv2d(cin, feat, 3, 1, 1, bias=False), nn.ReLU(),
                   nn.Conv2d(feat, feat, 3, 1, 1, bias=False), nn.ReLU(),
                   nn.MaxPool2d(2, 2)]
        cin = feat
    return nn.Sequential(*layers)


def make_mlp(dims):
    layers = []
    for i in range(len(dims) - 1):
        layers.append(nn.Linear(dims[i], dims[i + 1]))
        if i + 2 < len(dims):
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def randomize_bn_stats(module):
    """Make running stats non-trivial so eval-mode BN is actually tested."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def main():
    rng = np.random.default_rng(77)

    # --- stage1 trunk (named like the reference checkpoints) --------------
    stage1 = make_stage1()
    randomize_bn_stats(stage1)
    stage1.eval()
    x = rng.normal(0, 1, (2, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        y = stage1(torch.tensor(x)).numpy()
    sd = {f"feature_extractor_stage1.{k}": v.numpy()
          for k, v in stage1.state_dict().items()}
    np.savez(OUT / "stage1_parity.npz", x=x, y=y,
             **{f"sd::{k}": v for k, v in sd.items()})

    # --- conv+FC head (temporal-style: 49ch -> mesh) -----------------------
    head_conv = make_conv_head(49, (64, 128, 128, 256))
    head_fc = make_mlp((256 * 2 * 3, 1024, 512, 126))
    head_conv.eval(); head_fc.eval()
    hx = rng.normal(0, 1, (2, 49, 45, 60)).astype(np.float32)
    with torch.no_grad():
        hmid = head_conv(torch.tensor(hx))
        hy = head_fc(hmid.reshape(2, -1)).numpy()
    sd = {f"regressNet2_part1.{k}": v.numpy()
          for k, v in head_conv.state_dict().items()}
    sd.update({f"regressNet2_part2.{k}": v.numpy()
               for k, v in head_fc.state_dict().items()})
    np.savez(OUT / "head_parity.npz", x=hx, y=hy,
             **{f"sd::{k}": v for k, v in sd.items()})

    # --- conv3d smoothing trunk --------------------------------------------
    class TorchMotionPre(nn.Module):
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

        def forward(self, smesh1, smesh2, tsflow1, tsflow2):
            h1 = torch.cat([self.embedding1(smesh1), self.embedding3(tsflow1)], 4)
            h2 = torch.cat([self.embedding1(smesh2), self.embedding3(tsflow2)], 4)
            h = torch.cat([h1, h2], 4).permute(0, 4, 1, 2, 3)
            h = self.MotionConv3D(h)
            return self.decoding(h.permute(0, 2, 3, 4, 1))

    mp = TorchMotionPre(); mp.eval()
    smesh1 = rng.normal(0, 1, (2, 7, 7, 9, 2)).astype(np.float32)
    smesh2 = rng.normal(0, 1, (2, 7, 7, 9, 2)).astype(np.float32)
    tsm1 = rng.normal(0, 0.3, (2, 7, 7, 9, 2)).astype(np.float32)
    tsm2 = rng.normal(0, 0.3, (2, 7, 7, 9, 2)).astype(np.float32)
    tsf1 = np.cumsum(tsm1, axis=1)
    tsf2 = np.cumsum(tsm2, axis=1)
    with torch.no_grad():
        dy = mp(torch.tensor(smesh1), torch.tensor(smesh2),
                torch.tensor(tsf1), torch.tensor(tsf2)).numpy()
    sd = {f"MotionPre.{k}": v.numpy() for k, v in mp.state_dict().items()}
    np.savez(OUT / "smooth_parity.npz", smesh1=smesh1, smesh2=smesh2,
             tsmotion1=tsm1, tsmotion2=tsm2, y=dy,
             **{f"sd::{k}": v for k, v in sd.items()})

    print("model goldens written")


if __name__ == "__main__":
    main()
