"""Golden fixture for the three-view junction algebra.

Reproduces Full_model_inference/Codes/test_online_tra_threeview.py:348-427
with the reference's own TPS point kernel on fixed random smooth meshes
(no networks needed): mesh rescale to image resolution, mean-offset
alignment of the shared view, middle-plane construction, post-alignment
canvas extents, min re-basing, and the per-frame TPS reprojection of both
outer views into the middle plane.

Saves the model-res input meshes, the canvas min/extents, and the three
output mesh tracks (canvas coordinates, i.e. min-subtracted).

Usage: python tests/golden_gen/make_threeview_golden.py
"""

import importlib.util
import pathlib

import numpy as np
import torch

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens"
REF_UTILS = pathlib.Path("/root/reference/Full_model_inference/Codes/utils")

GRID_H, GRID_W = 6, 8
MODEL_H, MODEL_W = 360, 480
IMG_H, IMG_W = 480, 640
T = 4


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REF_UTILS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


tps_point = _load("torch_tps_transform_point")


def norm_mesh(mesh, h, w):
    out = torch.stack([mesh[..., 0] * 2.0 / w - 1.0,
                       mesh[..., 1] * 2.0 / h - 1.0], -1)
    return out.reshape(mesh.shape[0], -1, 2)


def recover(pts, h, w):
    mesh = torch.stack([(pts[..., 0] + 1) * w / 2.0,
                        (pts[..., 1] + 1) * h / 2.0], -1)
    return mesh.reshape(pts.shape[0], GRID_H + 1, GRID_W + 1, 2)


def rigid(h, w):
    xs = torch.linspace(0.0, float(w), GRID_W + 1)
    ys = torch.linspace(0.0, float(h), GRID_H + 1)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], -1)


def main():
    rng = np.random.default_rng(4100)
    base = rigid(MODEL_H, MODEL_W)[None].expand(T, -1, -1, -1).numpy()

    def mesh(shift, seed_scale=8.0):
        noise = rng.normal(0, seed_scale, (T, GRID_H + 1, GRID_W + 1, 2))
        return (base + noise + np.asarray(shift)).astype(np.float32)

    # pair (0,1): view0 warps right, view1 near rigid; pair (1,2): the shared
    # view 1 reappears displaced by ~(35,6) plus noise, view2 warps left.
    w12_m1 = mesh([140.0, 4.0])
    w12_m2 = mesh([8.0, 0.0])
    w23_m1 = mesh([43.0, 6.0])
    w23_m2 = mesh([-120.0, -3.0])

    def up(m):  # model res -> image res (reference :348-351)
        t = torch.tensor(m)
        return torch.stack([t[..., 0] * IMG_W / MODEL_W,
                            t[..., 1] * IMG_H / MODEL_H], -1)

    a, b, c, d = up(w12_m1), up(w12_m2), up(w23_m1), up(w23_m2)

    offset = (b - c).reshape(T, -1, 2).mean(1)[:, None, None]  # :353-357
    c = c + offset
    d = d + offset
    middle = (b + c) / 2.0

    allm = torch.stack([a, b, c, d])
    wmin, wmax = allm[..., 0].min(), allm[..., 0].max()
    hmin, hmax = allm[..., 1].min(), allm[..., 1].max()
    ow, oh = wmax - wmin, hmax - hmin

    sub = torch.tensor([wmin, hmin])
    a, b, c, d, middle = (x - sub for x in (a, b, c, d, middle))

    outs1, outs2 = [], []
    for i in range(T):
        na = norm_mesh(a[i:i + 1], oh, ow)
        nb = norm_mesh(b[i:i + 1], oh, ow)
        nc = norm_mesh(c[i:i + 1], oh, ow)
        nd = norm_mesh(d[i:i + 1], oh, ow)
        nm = norm_mesh(middle[i:i + 1], oh, ow)
        outs1.append(recover(tps_point.transformer(na, nb, nm), oh, ow))
        outs2.append(recover(tps_point.transformer(nd, nc, nm), oh, ow))
    out1 = torch.cat(outs1).numpy()
    out2 = torch.cat(outs2).numpy()

    np.savez(OUT / "threeview_parity.npz",
             w12_m1=w12_m1, w12_m2=w12_m2, w23_m1=w23_m1, w23_m2=w23_m2,
             img_h=IMG_H, img_w=IMG_W, model_h=MODEL_H, model_w=MODEL_W,
             wmin=wmin.numpy(), hmin=hmin.numpy(),
             view0=out1, view1=middle.numpy(), view2=out2)
    print("threeview_parity.npz", out1.shape,
          "canvas", float(ow), float(oh), "min", float(wmin), float(hmin))


if __name__ == "__main__":
    main()
