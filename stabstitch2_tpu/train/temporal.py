"""TemporalWarp trainer.

Parity target: TemporalWarp/Codes/train_ssd.py and the training wrapper
``build_model`` (network.py:71-94): augment, predict the mesh motion of
frame t toward t-1, TPS-warp frame t (plus a 3-channel mask) and compare to
frame t-1 on the mask; grid regularizers at weight 5.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from stabstitch2_tpu.config import TemporalTrainConfig
from stabstitch2_tpu.models import TemporalNet
from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.ops.tps import tps_warp_with_mask
from stabstitch2_tpu.train import losses
from stabstitch2_tpu.train.common import (TrainState, data_aug_pair,
                                           normalize_images)


def temporal_train_outputs(net: TemporalNet, variables, img_prev, img_next,
                           train: bool = True,
                           rng: Optional[jax.Array] = None):
    img_prev = normalize_images(img_prev)
    img_next = normalize_images(img_next)
    B, H, W, _ = img_prev.shape
    if train and rng is not None:
        a1, a2 = data_aug_pair(rng, img_prev, img_next)
    else:
        a1, a2 = img_prev, img_next

    mutable = ["batch_stats"] if train else False
    out = net.apply(variables, a1, a2, train, mutable=mutable)
    motion, new_vars = out if train else (out, {})

    rigid = rigid_mesh(H, W, dtype=img_prev.dtype)
    mesh = rigid[None] + motion
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    norm_rigid = jnp.broadcast_to(norm_rigid_pts[None],
                                  (B,) + norm_rigid_pts.shape)
    norm_mesh = mesh_points(normalize_mesh(mesh, H, W))
    # The reference warps concat([img, ones_like(img)]) — a 6-channel
    # gather, which lowers pathologically slowly on TPU (BENCHMARKS.md
    # 'TPU kernel findings'). Warp 3 channels, derive the mask
    # arithmetically (bit-equal), and concat it back to the reference's
    # [.., 6] layout (mask = ones_like(input2) broadcast to 3 channels).
    w, m = tps_warp_with_mask(img_next, norm_mesh, norm_rigid, (H, W))
    warped = jnp.concatenate(
        [w, jnp.broadcast_to(m[..., None], w.shape)], -1)
    return {"output_mesh": warped, "mesh": mesh, "motion": motion}, new_vars


def temporal_loss_fn(params, batch_stats, net, img_prev, img_next, rng,
                     cfg: TemporalTrainConfig):
    variables = {"params": params, "batch_stats": batch_stats}
    img_prev = normalize_images(img_prev)
    img_next = normalize_images(img_next)
    out, new_vars = temporal_train_outputs(net, variables, img_prev, img_next,
                                           train=True, rng=rng)
    overlap = losses.temporal_photometric_loss(img_prev, out["output_mesh"])
    gw = cfg.grid_weight
    nonoverlap = (gw * losses.inter_grid_loss(out["mesh"])
                  + gw * losses.intra_grid_loss(out["mesh"]))
    total = overlap + nonoverlap
    return total, (new_vars.get("batch_stats"),
                   {"overlap": overlap, "nonoverlap": nonoverlap,
                    "total": total})


@functools.partial(jax.jit, static_argnames=("net", "cfg"))
def temporal_train_step(state: TrainState, img_prev, img_next, rng,
                        net: TemporalNet, cfg: TemporalTrainConfig):
    grad_fn = jax.value_and_grad(temporal_loss_fn, has_aux=True)
    (loss, (new_bs, metrics)), grads = grad_fn(
        state.params, state.batch_stats, net, img_prev, img_next, rng, cfg)
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    return new_state, metrics
