"""SpatialWarp trainer.

Parity target: SpatialWarp/Codes/train_ssd.py (train_tra.py adds the
perceptual term and uses grid weight 5). The training wrapper reproduces
``build_model`` (network.py:90-156): augmentation, forward, full-resolution
bidirectional homography warps of image+mask, TPS warps of image+mask.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stabstitch2_tpu.config import SpatialTrainConfig
from stabstitch2_tpu.models import SpatialNet, VGG19Features
from stabstitch2_tpu.models.spatial import bidirectional_homographies
from stabstitch2_tpu.ops import (
    h2mesh,
    normalize_homography,
)
from stabstitch2_tpu.ops.homography import homo_warp_with_mask
from stabstitch2_tpu.ops.tps import tps_warp_with_mask
from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.train import losses
from stabstitch2_tpu.train.common import (TrainState, data_aug_pair,
                                           normalize_images)


def spatial_train_outputs(net: SpatialNet, variables, img1, img2,
                          train: bool = True, rng: Optional[jax.Array] = None
                          ) -> Tuple[Dict[str, jnp.ndarray], dict]:
    """Forward + warp assembly for the loss (reference build_model)."""
    img1 = normalize_images(img1)
    img2 = normalize_images(img2)
    B, H, W, _ = img1.shape
    if train and rng is not None:
        a1, a2 = data_aug_pair(rng, img1, img2)
    else:
        a1, a2 = img1, img2

    mutable = ["batch_stats"] if train else False
    out = net.apply(variables, a1, a2, train, mutable=mutable)
    (offset_1, mesh_motion_ref, mesh_motion_tgt), new_vars = (
        out if train else (out, {}))

    H_ref, H_tgt = bidirectional_homographies(offset_1.reshape(B, 4, 2), H, W)
    theta_ref = normalize_homography(H_ref, H, W)
    theta_tgt = normalize_homography(H_tgt, H, W)

    # Warp 3 channels + arithmetic coverage mask, then concat to the
    # reference's image+mask layout — warping concat([img, ones]) is the
    # same math, but TPU gathers are per-lookup-bound (BENCHMARKS.md
    # round 3b), so the arithmetic mask saves the ones-plane gather
    # inside the jitted training loop on the chip.
    def with_mask(w, m):
        return jnp.concatenate([w, m[..., None]], -1)

    out_H_ref = with_mask(*homo_warp_with_mask(img1, theta_ref, (H, W)))
    out_H_tgt = with_mask(*homo_warp_with_mask(img2, theta_tgt, (H, W)))

    rigid = rigid_mesh(H, W, dtype=img1.dtype)
    mesh_ref = h2mesh(H_ref, rigid) + mesh_motion_ref
    mesh_tgt = h2mesh(H_tgt, rigid) + mesh_motion_tgt
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, H, W))
    norm_rigid = jnp.broadcast_to(norm_rigid_pts[None],
                                  (B,) + norm_rigid_pts.shape)
    norm_ref = mesh_points(normalize_mesh(mesh_ref, H, W))
    norm_tgt = mesh_points(normalize_mesh(mesh_tgt, H, W))
    out_tps_ref = with_mask(
        *tps_warp_with_mask(img1, norm_ref, norm_rigid, (H, W)))
    out_tps_tgt = with_mask(
        *tps_warp_with_mask(img2, norm_tgt, norm_rigid, (H, W)))

    return {
        "output_H_ref": out_H_ref, "output_H_tgt": out_H_tgt,
        "output_tps_ref": out_tps_ref, "output_tps_tgt": out_tps_tgt,
        "mesh_ref": mesh_ref, "mesh_tgt": mesh_tgt, "mesh_rigid": rigid,
    }, new_vars


def spatial_loss_fn(params, batch_stats, net: SpatialNet, img1, img2, rng,
                    cfg: SpatialTrainConfig, vgg_apply=None):
    variables = {"params": params, "batch_stats": batch_stats}
    out, new_vars = spatial_train_outputs(net, variables, img1, img2,
                                          train=True, rng=rng)
    overlap = losses.spatial_photometric_loss(
        out["output_H_ref"], out["output_H_tgt"],
        out["output_tps_ref"], out["output_tps_tgt"])
    gw = cfg.grid_weight
    nonoverlap = (gw * losses.inter_grid_loss(out["mesh_ref"])
                  + gw * losses.intra_grid_loss(out["mesh_ref"])
                  + gw * losses.inter_grid_loss(out["mesh_tgt"])
                  + gw * losses.intra_grid_loss(out["mesh_tgt"]))
    total = overlap + nonoverlap
    metrics = {"overlap": overlap, "nonoverlap": nonoverlap}
    if cfg.perception_weight > 0.0 and vgg_apply is not None:
        perc = losses.perceptual_loss(vgg_apply, out["output_H_ref"],
                                      out["output_H_tgt"],
                                      out["output_tps_ref"],
                                      out["output_tps_tgt"])
        total = total + cfg.perception_weight * perc
        metrics["perception"] = perc
    metrics["total"] = total
    return total, (new_vars.get("batch_stats"), metrics)


@functools.partial(jax.jit, static_argnames=("net", "cfg", "vgg_apply"))
def spatial_train_step(state: TrainState, img1, img2, rng, net: SpatialNet,
                       cfg: SpatialTrainConfig, vgg_apply=None):
    grad_fn = jax.value_and_grad(spatial_loss_fn, has_aux=True)
    (loss, (new_bs, metrics)), grads = grad_fn(
        state.params, state.batch_stats, net, img1, img2, rng, cfg, vgg_apply)
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    return new_state, metrics


def make_vgg_apply(vgg_variables):
    """Freeze a VGG19Features apply fn for the perceptual loss."""
    vgg = VGG19Features()

    def apply(img_255):
        return vgg.apply(vgg_variables, img_255)

    return apply
