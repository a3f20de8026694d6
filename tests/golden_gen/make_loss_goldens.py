"""Goldens for loss functions and metrics vs torch/numpy oracles.

Torch oracles below mirror the reference loss formulas (including the 5-D
grid-loss axis quirk) — my own oracle code, used once to produce fixtures.
"""

import pathlib

import numpy as np
import torch
import torch.nn.functional as F

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"
GH, GW = 6, 8


def inter_grid_4d(mesh):
    cos_w_num = (
        (mesh[:, :, 0:GW, :] - mesh[:, :, 1:GW + 1, :])[:, :, 0:GW - 1, :]
        * (mesh[:, :, 0:GW, :] - mesh[:, :, 1:GW + 1, :])[:, :, 1:GW, :]
    ).sum(3)
    w_edges = mesh[:, :, 0:GW, :] - mesh[:, :, 1:GW + 1, :]
    cos_w = cos_w_num / (w_edges[:, :, 0:GW - 1, :].pow(2).sum(3).sqrt()
                         * w_edges[:, :, 1:GW, :].pow(2).sum(3).sqrt())
    dw = 1 - cos_w
    dw = dw[:, 0:GH, :] + dw[:, 1:GH + 1, :]
    h_edges = mesh[:, 0:GH, :, :] - mesh[:, 1:GH + 1, :, :]
    cos_h = ((h_edges[:, 0:GH - 1, :, :] * h_edges[:, 1:GH, :, :]).sum(3)
             / (h_edges[:, 0:GH - 1, :, :].pow(2).sum(3).sqrt()
                * h_edges[:, 1:GH, :, :].pow(2).sum(3).sqrt()))
    dh = 1 - cos_h
    dh = dh[:, :, 0:GW] + dh[:, :, 1:GW + 1]
    return dw.mean() + dh.mean()


def inter_grid_5d_quirk(mesh):
    # 5-D variant summing over axis 3 (the reference's quirk)
    w_edges = mesh[:, :, :, 0:GW, :] - mesh[:, :, :, 1:GW + 1, :]
    cos_w = ((w_edges[:, :, :, 0:GW - 1, :] * w_edges[:, :, :, 1:GW, :]).sum(3)
             / (w_edges[:, :, :, 0:GW - 1, :].pow(2).sum(3).sqrt()
                * w_edges[:, :, :, 1:GW, :].pow(2).sum(3).sqrt()))
    dw = 1 - cos_w
    dw = dw[:, :, 0:GH, :] + dw[:, :, 1:GH + 1, :]
    h_edges = mesh[:, :, 0:GH, :, :] - mesh[:, :, 1:GH + 1, :, :]
    cos_h = ((h_edges[:, :, 0:GH - 1, :, :] * h_edges[:, :, 1:GH, :, :]).sum(3)
             / (h_edges[:, :, 0:GH - 1, :, :].pow(2).sum(3).sqrt()
                * h_edges[:, :, 1:GH, :, :].pow(2).sum(3).sqrt()))
    dh = 1 - cos_h
    dh = dh[:, :, :, 0:GW] + dh[:, :, :, 1:GW + 1]
    return dw.mean() + dh.mean()


def intra_grid_5d(pts):
    max_w = 480 / GW * 2
    max_h = 360 / GH * 2
    dx = pts[:, :, :, 1:GW + 1, 0] - pts[:, :, :, 0:GW, 0]
    dy = pts[:, :, 1:GH + 1, :, 1] - pts[:, :, 0:GH, :, 1]
    return F.relu(dx - max_w).mean() + F.relu(dy - max_h).mean()


def bicubic_oracle(x, size, align):
    return F.interpolate(torch.tensor(x), size, mode="bicubic",
                         align_corners=align).numpy()


def main():
    rng = np.random.default_rng(5)

    # grid losses: rigid mesh + noise
    xs = np.linspace(0, 480, GW + 1)
    ys = np.linspace(0, 360, GH + 1)
    base = np.stack(np.meshgrid(xs, ys), -1)
    mesh4 = (base[None] + rng.normal(0, 15, (3, GH + 1, GW + 1, 2))
             ).astype(np.float32)
    mesh5 = (base[None, None] + rng.normal(0, 15, (2, 4, GH + 1, GW + 1, 2))
             ).astype(np.float32)
    np.savez(OUT / "grid_losses.npz",
             mesh4=mesh4, mesh5=mesh5,
             inter4=inter_grid_4d(torch.tensor(mesh4)).numpy(),
             inter5=inter_grid_5d_quirk(torch.tensor(mesh5)).numpy(),
             intra5=intra_grid_5d(torch.tensor(mesh5)).numpy())

    # bicubic resize parity
    x = rng.normal(0, 1, (2, 2, 7, 9)).astype(np.float32)  # NCHW for torch
    up_t = bicubic_oracle(x, (28, 36), True)
    up_f = bicubic_oracle(x, (28, 36), False)
    down_f = bicubic_oracle(rng.normal(0, 1, (1, 1, 45, 60)).astype(np.float32),
                            (12, 17), False)
    np.savez(OUT / "bicubic.npz", x=x, up_true=up_t, up_false=up_f)

    print("loss goldens written")


if __name__ == "__main__":
    main()
