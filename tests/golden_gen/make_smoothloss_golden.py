"""Golden fixture for the six-term SmoothWarp training loss.

Runs the REFERENCE SmoothWarp training loss end-to-end on fixed random
inputs: SmoothWarp/Codes/network.py ``build_model`` (transport + net forward
+ TPS warps + dense path fields) inside the exact window loop of
train_ssd.py:120-203, using the reference's own loss.py terms and weights
(1/50/10/1/0.1/1000). torchvision is stubbed and ``.cuda()`` patched to a
no-op, like make_fullnet_goldens.py.

Saves the net state_dict, the raw motion/image inputs, and every loss term,
so tests can assert numeric parity of ``smooth_loss_fn``.

Usage: python tests/golden_gen/make_smoothloss_golden.py
"""

import pathlib
import sys

import numpy as np
import torch

HERE = pathlib.Path(__file__).resolve().parent
OUT = HERE.parent / "goldens"
REF = pathlib.Path("/root/reference/SmoothWarp/Codes")

sys.path.insert(0, str(HERE))
from make_fullnet_goldens import _install_torchvision_stub, _patch_cuda_noop  # noqa: E402

TRAIN_SQE = 2
FRAME_NUM = 7
H, W = 360, 480
B = 1


def main():
    torch.manual_seed(21)
    rng = np.random.default_rng(2100)
    _install_torchvision_stub()
    _patch_cuda_noop()
    sys.path.insert(0, str(REF))
    import network  # noqa: E402 (reference SmoothWarp module)
    from loss import cal_lp_loss, inter_grid_loss, intra_grid_loss, l_num_loss  # noqa: E402

    net = network.Network()
    net.eval()

    T_total = TRAIN_SQE - 1 + FRAME_NUM
    tm1 = rng.normal(0, 2.0, (T_total, B, 7, 9, 2)).astype(np.float32)
    tm2 = rng.normal(0, 2.0, (T_total, B, 7, 9, 2)).astype(np.float32)
    sm1 = rng.normal(0, 3.0, (T_total, B, 7, 9, 2)).astype(np.float32)
    sm2 = rng.normal(0, 3.0, (T_total, B, 7, 9, 2)).astype(np.float32)
    im1 = rng.uniform(-1, 1, (T_total, B, 3, H, W)).astype(np.float32)
    im2 = rng.uniform(-1, 1, (T_total, B, 3, H, W)).astype(np.float32)

    tlist1 = [torch.tensor(x) for x in tm1]
    tlist2 = [torch.tensor(x) for x in tm2]
    slist1 = [torch.tensor(x) for x in sm1]
    slist2 = [torch.tensor(x) for x in sm2]
    ilist1 = [torch.tensor(x) for x in im1]
    ilist2 = [torch.tensor(x) for x in im2]

    data = smooth = shape = traj = align = online = torch.tensor(0.0)
    paths1, paths2 = [], []
    path_diff1 = path_diff2 = None
    with torch.no_grad():
        for k in range(TRAIN_SQE):
            out = network.build_model(
                net, tlist1[k:k + FRAME_NUM], tlist2[k:k + FRAME_NUM],
                slist1[k:k + FRAME_NUM], slist2[k:k + FRAME_NUM],
                ilist1[k:k + FRAME_NUM], ilist2[k:k + FRAME_NUM])
            if k == 0:
                sp1, sp2 = out["smooth_path1"], out["smooth_path2"]
                data = (l_num_loss(out["ori_path1"], sp1, 2)
                        + l_num_loss(out["ori_path2"], sp2, 2))
                for path in (sp1, sp2):
                    for gap, wgt in ((3, 0.1), (2, 0.3), (1, 0.9)):
                        left = path[:, 3 - gap:path.shape[1] - 3 - gap]
                        right = path[:, 3 + gap:path.shape[1] - 3 + gap
                                     if gap != 3 else None]
                        mid = path[:, 3:-3]
                        smooth = smooth + (l_num_loss(left, mid, 2)
                                           + l_num_loss(right, mid, 2)) * wgt
                shape = (inter_grid_loss(out["target_mesh1"])
                         + intra_grid_loss(out["target_mesh1"])
                         + inter_grid_loss(out["target_mesh2"])
                         + intra_grid_loss(out["target_mesh2"]))
                traj = l_num_loss(out["dense_spath1"] * out["ovmask_spath"],
                                  out["dense_spath2"] * out["ovmask_spath"], 1)
                align = cal_lp_loss(out["wimg1"], out["wimg2"],
                                    out["ovmask_img"])
                paths1.append(out["smooth_path1"])
                paths2.append(out["smooth_path2"])
                path_diff1 = out["tsmotion_list1"][1].unsqueeze(1)
                path_diff2 = out["tsmotion_list2"][1].unsqueeze(1)
            else:
                paths1.append(out["smooth_path1"] + path_diff1)
                paths2.append(out["smooth_path2"] + path_diff2)
        for k in range(TRAIN_SQE - 1):
            online = online + l_num_loss(paths1[k][:, 1:], paths1[k + 1][:, :-1], 2)
            online = online + l_num_loss(paths2[k][:, 1:], paths2[k + 1][:, :-1], 2)

    total = data * 1 + smooth * 50 + shape * 10 + traj * 1 + online * 0.1 + align * 1000
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    np.savez(OUT / "smoothloss_parity.npz",
             tmotion1=tm1, tmotion2=tm2, smotion1=sm1, smotion2=sm2,
             img1=im1, img2=im2,
             data=data.numpy(), smoothness=smooth.numpy(), shape=shape.numpy(),
             trajectory=traj.numpy(), online=online.numpy(),
             align=align.numpy(), total=total.numpy(),
             **{f"sd::{k}": v for k, v in sd.items()})
    print("smoothloss_parity.npz  terms:",
          {n: float(v) for n, v in [("data", data), ("smooth", smooth),
                                    ("shape", shape), ("traj", traj),
                                    ("online", online), ("align", align),
                                    ("total", total)]})


if __name__ == "__main__":
    main()
