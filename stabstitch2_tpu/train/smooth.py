"""SmoothWarp trainer — the six-term online-collaboration recipe.

Parity targets: SmoothWarp/Codes/train_ssd.py:93-209 (loss wiring, weights
1/50/10/1/0.1/1000) and ``build_model`` (network.py:77-179): per-window
temporal-motion transport, SmoothNet forward, TPS warps of the window's
last images, and 1/4-resolution dense smooth-path fields warped into the
panorama for the trajectory-consistency term.

TPU-first notes: the transport runs as one batched shared-source TPS solve
per window; the two shifted windows (train_sqe=2) are evaluated in a python
loop that unrolls into one jitted graph.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from stabstitch2_tpu.config import SmoothTrainConfig
from stabstitch2_tpu.models import SmoothNet
from stabstitch2_tpu.models.smooth import smooth_outputs
from stabstitch2_tpu.ops import tps_warp
from stabstitch2_tpu.ops.tps import tps_warp_with_mask
from stabstitch2_tpu.ops.mesh import (
    denormalize_mesh,
    mesh_points,
    normalize_mesh,
    points_mesh,
    rigid_mesh,
)
from stabstitch2_tpu.ops.resize import resize_bicubic
from stabstitch2_tpu.ops.tps import tps_params_shared_source, tps_transform_points
from stabstitch2_tpu.train import losses
from stabstitch2_tpu.train.common import TrainState, normalize_images


def transport_window(tmotion: jnp.ndarray, smotion: jnp.ndarray,
                     img_h: int, img_w: int) -> jnp.ndarray:
    """Batched transport for [B, T, GH+1, GW+1, 2] windows (t=0 zeroed)."""
    B, T = tmotion.shape[:2]
    gh, gw = tmotion.shape[2] - 1, tmotion.shape[3] - 1
    rigid = rigid_mesh(img_h, img_w, dtype=tmotion.dtype)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, img_h, img_w))

    smesh = rigid[None, None] + smotion
    tmesh = rigid[None, None] + tmotion
    norm_smesh = normalize_mesh(smesh, img_h, img_w)
    norm_tmesh = normalize_mesh(tmesh, img_h, img_w)

    targets = mesh_points(norm_smesh[:, :-1]).reshape(B * (T - 1), -1, 2)
    points = mesh_points(norm_tmesh[:, 1:]).reshape(B * (T - 1), -1, 2)
    Tc = tps_params_shared_source(norm_rigid_pts, targets)
    src = jnp.broadcast_to(norm_rigid_pts[None], targets.shape)
    tsmesh = tps_transform_points(points, src, targets, T=Tc)
    tsmesh = points_mesh(tsmesh, grid_h=gh, grid_w=gw).reshape(
        B, T - 1, gh + 1, gw + 1, 2)
    tsmotion = denormalize_mesh(tsmesh, img_h, img_w) - smesh[:, 1:]
    return jnp.concatenate([jnp.zeros_like(tsmotion[:, :1]), tsmotion], 1)


def smooth_train_outputs(net: SmoothNet, params, tmotion1, tmotion2,
                         smotion1, smotion2, img1, img2
                         ) -> Dict[str, jnp.ndarray]:
    """One window's forward + loss tensors (reference build_model).

    tmotion*/smotion*: [B, T, GH+1, GW+1, 2]; img*: [B, T, H, W, 3].
    """
    B, T = tmotion1.shape[:2]
    H, W = img1.shape[2], img1.shape[3]

    ts1 = transport_window(tmotion1, smotion1, H, W)
    ts2 = transport_window(tmotion2, smotion2, H, W)
    rigid = rigid_mesh(H, W, dtype=smotion1.dtype)
    smesh1 = rigid[None, None] + smotion1
    smesh2 = rigid[None, None] + smotion2

    raw = net.apply({"params": params}, smesh1, smesh2, ts1, ts2)
    out = smooth_outputs(raw)
    # training naming: target_mesh is the actual warp (ori - delta)
    target_mesh1, target_mesh2 = out["smooth_mesh1"], out["smooth_mesh2"]

    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))

    # --- alignment term tensors: warp the LAST image of the window --------
    # 3-channel gather + arithmetic coverage mask: the reference warps
    # concat([img, ones]) (4 channels); TPU gathers are per-lookup-bound
    # (BENCHMARKS.md round 3b), so computing the mask arithmetically
    # saves the ones-plane gather inside the jitted smooth train step.
    def warp_last(img, target_mesh):
        src = mesh_points(normalize_mesh(target_mesh[:, -1], H, W))
        tgt = jnp.broadcast_to(norm_rigid_pts[None], src.shape)
        return tps_warp_with_mask(img[:, -1], src, tgt, (H, W))

    w1, m1 = warp_last(img1, target_mesh1)
    w2, m2 = warp_last(img2, target_mesh2)
    ovmask_img = (m1 * m2)[..., None]

    # --- trajectory term tensors: dense 1/4-res smooth-path fields --------
    qh, qw = H // 4, W // 4

    def dense_paths(smooth_path, target_mesh):
        gh1, gw1 = smooth_path.shape[2], smooth_path.shape[3]
        flat = smooth_path.reshape(B * T, gh1, gw1, 2)
        dense = resize_bicubic(flat, (qh, qw), align_corners=True)
        dense = jnp.concatenate([dense, jnp.ones_like(dense[..., :1])], -1)
        src = mesh_points(normalize_mesh(
            target_mesh.reshape(B * T, gh1, gw1, 2), H, W))
        tgt = jnp.broadcast_to(norm_rigid_pts[None], src.shape)
        return tps_warp(dense, src, tgt, (qh, qw))

    d1 = dense_paths(out["smooth_path1"], target_mesh1)
    d2 = dense_paths(out["smooth_path2"], target_mesh2)
    ovmask_spath = (d1[..., 2] * d2[..., 2])[..., None]

    return {
        "tsmotion1": ts1, "tsmotion2": ts2,
        "ori_path1": out["ori_path1"], "ori_path2": out["ori_path2"],
        "smooth_path1": out["smooth_path1"], "smooth_path2": out["smooth_path2"],
        "target_mesh1": target_mesh1, "target_mesh2": target_mesh2,
        "ori_mesh1": out["ori_mesh1"], "ori_mesh2": out["ori_mesh2"],
        "wimg1": w1, "wimg2": w2, "ovmask_img": ovmask_img,
        "dense_spath1": d1[..., :2], "dense_spath2": d2[..., :2],
        "ovmask_spath": ovmask_spath,
    }


def smooth_loss_fn(params, net: SmoothNet, batch, cfg: SmoothTrainConfig
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Six-term loss over train_sqe shifted windows (train_ssd.py:106-203)."""
    tmotion1, tmotion2, smotion1, smotion2, img1, img2 = batch
    img1 = normalize_images(img1)
    img2 = normalize_images(img2)
    F = cfg.frame_num
    data = smoothness = shape = trajectory = align = 0.0
    paths1, paths2 = [], []
    base_path1 = base_path2 = None
    for k in range(cfg.train_sqe):
        sl = slice(k, k + F)
        out = smooth_train_outputs(
            net, params, tmotion1[:, sl], tmotion2[:, sl],
            smotion1[:, sl], smotion2[:, sl], img1[:, sl], img2[:, sl])
        if k == 0:
            data = (losses.l_num_loss(out["ori_path1"], out["smooth_path1"], 2)
                    + losses.l_num_loss(out["ori_path2"], out["smooth_path2"], 2))
            smoothness = (losses.path_smoothness_loss(out["smooth_path1"])
                          + losses.path_smoothness_loss(out["smooth_path2"]))
            # reference-faithful 5-D grid loss (see inter_grid_loss_5d_ref)
            shape = (losses.inter_grid_loss_5d_ref(out["target_mesh1"])
                     + losses.intra_grid_loss(out["target_mesh1"])
                     + losses.inter_grid_loss_5d_ref(out["target_mesh2"])
                     + losses.intra_grid_loss(out["target_mesh2"]))
            trajectory = losses.l_num_loss(
                out["dense_spath1"] * out["ovmask_spath"],
                out["dense_spath2"] * out["ovmask_spath"], 1)
            align = losses.brightness_balanced_l1(
                out["wimg1"], out["wimg2"], out["ovmask_img"])
            paths1.append(out["smooth_path1"])
            paths2.append(out["smooth_path2"])
            # re-basing for later windows (train_ssd.py:187-195): window k
            # is based at frame k, offset from window 0's base by the
            # accumulated transported motion over frames 1..k — which is
            # exactly window 0's ori_path at index k (ori_path =
            # cumsum(tsmotion), models/smooth.py; for the reference's
            # train_sqe=2 this is tsmotion[:, 1])
            base_path1 = out["ori_path1"]
            base_path2 = out["ori_path2"]
        else:
            paths1.append(out["smooth_path1"] + base_path1[:, k][:, None])
            paths2.append(out["smooth_path2"] + base_path2[:, k][:, None])

    online = (losses.online_collaboration_loss(paths1)
              + losses.online_collaboration_loss(paths2))
    total = (cfg.data_weight * data + cfg.smooth_weight * smoothness
             + cfg.shape_weight * shape + cfg.trajectory_weight * trajectory
             + cfg.online_weight * online + cfg.align_weight * align)
    return total, {"total": total, "data": data, "smoothness": smoothness,
                   "shape": shape, "trajectory": trajectory, "online": online,
                   "align": align}


@functools.partial(jax.jit, static_argnames=("net", "cfg"))
def smooth_train_step(state: TrainState, batch, net: SmoothNet,
                      cfg: SmoothTrainConfig):
    grad_fn = jax.value_and_grad(smooth_loss_fn, has_aux=True)
    (loss, metrics), grads = grad_fn(state.params, net, batch, cfg)
    new_state = state.apply_gradients(grads)
    return new_state, metrics
