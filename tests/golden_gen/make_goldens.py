"""Generate golden parity fixtures from the reference implementation.

Runs the reference's torch kernels (mounted read-only at /root/reference)
on fixed random inputs and stores inputs+outputs as .npz. The committed
fixtures are pure data; tests never import the reference.

Usage:  python tests/golden_gen/make_goldens.py
"""

import importlib.util
import pathlib
import sys

import numpy as np
import torch

REF = pathlib.Path("/root/reference/Full_model_inference/Codes")
OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"
OUT.mkdir(exist_ok=True)

GRID_H, GRID_W = 6, 8


def load_ref(name):
    spec = importlib.util.spec_from_file_location(name, REF / "utils" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


torch_DLT = load_ref("torch_DLT")
torch_homo = load_ref("torch_homo_transform")
torch_tps = load_ref("torch_tps_transform")
torch_tps_point = load_ref("torch_tps_transform_point")

rng = np.random.default_rng(1234)
torch.manual_seed(0)


def norm_rigid_mesh(bs):
    xs = np.linspace(-1, 1, GRID_W + 1)
    ys = np.linspace(-1, 1, GRID_H + 1)
    gx, gy = np.meshgrid(xs, ys)
    mesh = np.stack([gx, gy], -1).reshape(1, -1, 2)
    return np.repeat(mesh, bs, axis=0).astype(np.float32)


def main():
    # ---- DLT -------------------------------------------------------------
    bs = 5
    src = np.stack([np.array([[0, 0], [480, 0], [0, 360], [480, 360]], np.float32)] * bs)
    dst = src + rng.normal(0, 25, src.shape).astype(np.float32)
    H = torch_DLT.tensor_DLT(torch.tensor(src), torch.tensor(dst)).numpy()
    np.savez(OUT / "dlt.npz", src=src, dst=dst, H=H)

    # ---- homography transformer -------------------------------------------
    bs, c, h, w = 3, 4, 24, 32
    img = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    # near-identity normalized homographies with noticeable perspective
    theta = np.stack([np.eye(3, dtype=np.float32)] * bs)
    theta += rng.normal(0, 0.08, theta.shape).astype(np.float32)
    theta[:, 2, 2] = 1.0
    out = torch_homo.transformer(torch.tensor(img), torch.tensor(theta), (h, w)).numpy()
    out_big = torch_homo.transformer(torch.tensor(img), torch.tensor(theta), (h + 9, w + 13)).numpy()
    np.savez(OUT / "homo.npz", img=img, theta=theta, out=out, out_big=out_big)

    # ---- TPS image transformer (NORMAL + FAST) -----------------------------
    bs, c, h, w = 2, 4, 36, 48
    img = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    target = norm_rigid_mesh(bs)
    source = (target + rng.normal(0, 0.07, target.shape)).astype(np.float32)
    out_n = torch_tps.transformer(torch.tensor(img), torch.tensor(source),
                                  torch.tensor(target), (h, w), mode="NORMAL").numpy()
    out_f = torch_tps.transformer(torch.tensor(img), torch.tensor(source),
                                  torch.tensor(target), (h, w), mode="FAST").numpy()
    out_big = torch_tps.transformer(torch.tensor(img), torch.tensor(source),
                                    torch.tensor(target), (h + 12, w + 8), mode="NORMAL").numpy()
    np.savez(OUT / "tps.npz", img=img, source=source, target=target,
             out_normal=out_n, out_fast=out_f, out_big=out_big)

    # ---- TPS point transform ----------------------------------------------
    bs = 3
    source = norm_rigid_mesh(bs)
    target = (source + rng.normal(0, 0.07, source.shape)).astype(np.float32)
    points = rng.uniform(-1.1, 1.1, (bs, 40, 2)).astype(np.float32)
    out_pts = torch_tps_point.transformer(torch.tensor(points), torch.tensor(source),
                                          torch.tensor(target)).numpy()
    np.savez(OUT / "tps_point.npz", points=points, source=source, target=target,
             out=out_pts)

    # ---- cost volume oracle (independent torch impl of the semantics) ------
    import torch.nn.functional as F

    def cv_oracle(x1, x2, sr):
        b, ch, hh, ww = x1.shape
        pad = F.pad(x2, [sr] * 4)
        k = 2 * sr + 1
        patches = F.unfold(pad, (k, k)).reshape(b, ch, k * k, hh, ww)
        vol = (x1.unsqueeze(2) * patches).mean(dim=1)
        return F.leaky_relu(vol, 0.1)

    bs, c, h, w = 2, 16, 12, 15
    x1 = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    x2 = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    vol3 = cv_oracle(torch.tensor(x1), torch.tensor(x2), 3).numpy()
    vol5 = cv_oracle(torch.tensor(x1), torch.tensor(x2), 5).numpy()
    np.savez(OUT / "cost_volume.npz", x1=x1, x2=x2, vol3=vol3, vol5=vol5)

    # ---- CCL oracle ---------------------------------------------------------
    def ccl_oracle(f1, f2):
        b, ch, hh, ww = f1.shape
        n1 = F.normalize(f1, p=2, dim=1)
        n2 = F.normalize(f2, p=2, dim=1)
        pad2 = torch.nn.ZeroPad2d(1)(n2).permute(0, 2, 3, 1)
        patches = pad2.unfold(1, 3, 1).unfold(2, 3, 1)  # b, h, w, c, 3, 3
        filt = patches.reshape(b, -1, ch, 3, 3)
        vols = [F.conv2d(n1[i:i + 1], filt[i], padding=1) for i in range(b)]
        mv = torch.cat(vols, 0)
        mv = F.softmax(mv * 10.0, 1)
        chn = mv.shape[1]
        hs = torch.arange(hh, dtype=torch.float32).view(1, 1, hh, 1)
        ws = torch.arange(ww, dtype=torch.float32).view(1, 1, 1, ww)
        cs = torch.arange(chn, dtype=torch.float32).view(1, chn, 1, 1)
        fh = (mv * (torch.div(cs, ww, rounding_mode="floor") - hs)).sum(1, keepdim=True)
        fw = (mv * (cs % ww - ws)).sum(1, keepdim=True)
        return torch.cat([fw, fh], 1)

    bs, c, h, w = 2, 12, 9, 11
    f1 = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    f2 = rng.normal(0, 1, (bs, c, h, w)).astype(np.float32)
    flow = ccl_oracle(torch.tensor(f1), torch.tensor(f2)).numpy()
    np.savez(OUT / "ccl.npz", f1=f1, f2=f2, flow=flow)

    print("goldens written to", OUT)
    for f in sorted(OUT.glob("*.npz")):
        print(" ", f.name, f.stat().st_size, "bytes")


if __name__ == "__main__":
    sys.exit(main())
