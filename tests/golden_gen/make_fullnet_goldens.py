"""Full-network forward-parity fixtures from the REFERENCE model classes.

Runs the reference's complete ``SpatialNet`` / ``TemporalNet`` classes
(Full_model_inference/Codes/{spatial,temporal}_network.py) verbatim with:
- torchvision stubbed by a torch.nn-only resnet18 (random weights — the
  image has no torchvision / no egress for pretrained weights), and
- ``.cuda()`` patched to a no-op (the reference calls it unconditionally
  in a few spots, e.g. spatial_network.py:300).

Saves state_dict + inputs + every forward output, so tests can convert the
weights with utils/torch_import.py and assert END-TO-END composition parity
(backbone -> CCL -> bidirectional DLT split -> feature warps -> dual cost
volumes -> mesh heads), which block-level goldens cannot see.

Usage: python tests/golden_gen/make_fullnet_goldens.py
"""

import pathlib
import sys
import types

import numpy as np
import torch
import torch.nn as nn

HERE = pathlib.Path(__file__).resolve().parent
OUT = HERE.parent / "goldens"
REF = pathlib.Path("/root/reference/Full_model_inference/Codes")

sys.path.insert(0, str(HERE))          # reuse the torch oracle blocks
from make_model_goldens import TorchBasicBlock, randomize_bn_stats  # noqa: E402


# --- torchvision stub (structure only; torchvision is not installed) -------
class ResNet18Stub(nn.Module):
    """torchvision-resnet18-shaped trunk (the attributes the reference uses)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64),
                                    TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2),
                                    TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2),
                                    TorchBasicBlock(256, 256))


def _install_torchvision_stub():
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_resnet.resnet18 = lambda *a, **k: ResNet18Stub()
    tv_models.resnet = tv_resnet
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules.update({
        "torchvision": tv,
        "torchvision.models": tv_models,
        "torchvision.models.resnet": tv_resnet,
        "torchvision.transforms": tv_transforms,
    })


def _patch_cuda_noop():
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self


def main():
    torch.manual_seed(11)
    rng = np.random.default_rng(1100)
    _install_torchvision_stub()
    _patch_cuda_noop()
    sys.path.insert(0, str(REF))
    import spatial_network  # noqa: E402 (reference module)
    import temporal_network  # noqa: E402

    # --- SpatialNet: full forward + build wrapper --------------------------
    net = spatial_network.SpatialNet()
    randomize_bn_stats(net)
    net.eval()
    img1 = rng.uniform(-1, 1, (2, 3, 360, 480)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (2, 3, 360, 480)).astype(np.float32)
    with torch.no_grad():
        off1, off_ref, off_tgt = net(torch.tensor(img1), torch.tensor(img2))
        out = spatial_network.build_SpatialNet(
            net, torch.tensor(img1), torch.tensor(img2))
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez(OUT / "spatialnet_parity.npz",
             img1=img1, img2=img2,
             offset1=off1.numpy(), offset_ref=off_ref.numpy(),
             offset_tgt=off_tgt.numpy(),
             motion1=out["motion1"].numpy(), motion2=out["motion2"].numpy(),
             **{f"sd::{k}": v for k, v in sd.items()})
    print("spatialnet_parity.npz", off1.shape, out["motion1"].shape)

    # --- TemporalNet: sequential clip forward -------------------------------
    tnet = temporal_network.TemporalNet()
    randomize_bn_stats(tnet)
    tnet.eval()
    frames = rng.uniform(-1, 1, (4, 1, 3, 360, 480)).astype(np.float32)
    with torch.no_grad():
        tout = temporal_network.build_TemporalNet(
            tnet, [torch.tensor(f) for f in frames])
    motions = np.stack([m.numpy() for m in tout["motion_list"]])  # [T,1,...]
    tsd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    np.savez(OUT / "temporalnet_parity.npz",
             frames=frames, motions=motions,
             **{f"sd::{k}": v for k, v in tsd.items()})
    print("temporalnet_parity.npz", motions.shape)


if __name__ == "__main__":
    main()
