"""Loss library for all three stages.

Parity targets (weights live in config.py presets):
- SpatialWarp/Codes/loss.py — photometric overlap (:53-66), perceptual
  (:28-46), inter/intra grid (:69-122)
- TemporalWarp/Codes/loss.py — photometric vs previous frame (:15-23)
- SmoothWarp/Codes/loss.py + inline terms in train_ssd.py:144-203 —
  data/smoothness/shape/trajectory/online/alignment.

All images NHWC with the warp mask as the last channel where applicable.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from stabstitch2_tpu.config import MODEL_H, MODEL_W


def l_num_loss(a: jnp.ndarray, b: jnp.ndarray, l_num: int = 1) -> jnp.ndarray:
    """mean(|(a-b)^n|), the reference's generic distance (loss.py:48-49)."""
    return jnp.mean(jnp.abs((a - b) ** l_num))


# ---------------------------------------------------------------------------
# grid-shape regularizers
# ---------------------------------------------------------------------------


def inter_grid_loss(mesh: jnp.ndarray) -> jnp.ndarray:
    """Angle preservation between successive mesh edges (1 - cos).

    mesh: [..., GH+1, GW+1, 2]; leading dims arbitrary (the smooth stage
    passes [B, T, ...], SpatialWarp/Codes/loss.py:69-104 uses [B, ...]).
    """
    gh, gw = mesh.shape[-3] - 1, mesh.shape[-2] - 1
    w_edges = mesh[..., :, 0:gw, :] - mesh[..., :, 1:gw + 1, :]
    num = jnp.sum(w_edges[..., :, 0:gw - 1, :] * w_edges[..., :, 1:gw, :], -1)
    den = (jnp.sqrt(jnp.sum(w_edges[..., :, 0:gw - 1, :] ** 2, -1))
           * jnp.sqrt(jnp.sum(w_edges[..., :, 1:gw, :] ** 2, -1)))
    dw = 1.0 - num / den
    dw = dw[..., 0:gh, :] + dw[..., 1:gh + 1, :]

    h_edges = mesh[..., 0:gh, :, :] - mesh[..., 1:gh + 1, :, :]
    num = jnp.sum(h_edges[..., 0:gh - 1, :, :] * h_edges[..., 1:gh, :, :], -1)
    den = (jnp.sqrt(jnp.sum(h_edges[..., 0:gh - 1, :, :] ** 2, -1))
           * jnp.sqrt(jnp.sum(h_edges[..., 1:gh, :, :] ** 2, -1)))
    dh = 1.0 - num / den
    dh = dh[..., :, 0:gw] + dh[..., :, 1:gw + 1]
    return jnp.mean(dw) + jnp.mean(dh)


def inter_grid_loss_5d_ref(mesh: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful 5-D variant used by the smooth stage and metrics.

    The reference's [B, T, GH+1, GW+1, 2] version (SmoothWarp/Codes/loss.py:
    33-50) reduces over **axis 3** — the grid-column axis, not the (x, y)
    coordinate axis — almost certainly a bug, but both SmoothWarp training
    (train_ssd.py:176-177) and the published distortion metric
    (test_metric_ssd.py:473-501) were produced with it, so parity requires
    replicating it exactly. ``mesh``: [B, T, GH+1, GW+1, 2].
    """
    gh, gw = mesh.shape[2] - 1, mesh.shape[3] - 1
    w_edges = mesh[:, :, :, 0:gw, :] - mesh[:, :, :, 1:gw + 1, :]
    num = jnp.sum(w_edges[:, :, :, 0:gw - 1, :] * w_edges[:, :, :, 1:gw, :], 3)
    den = (jnp.sqrt(jnp.sum(w_edges[:, :, :, 0:gw - 1, :] ** 2, 3))
           * jnp.sqrt(jnp.sum(w_edges[:, :, :, 1:gw, :] ** 2, 3)))
    dw = 1.0 - num / den                       # [B, T, GH+1, 2]
    dw = dw[:, :, 0:gh, :] + dw[:, :, 1:gh + 1, :]

    h_edges = mesh[:, :, 0:gh, :, :] - mesh[:, :, 1:gh + 1, :, :]
    num = jnp.sum(h_edges[:, :, 0:gh - 1, :, :] * h_edges[:, :, 1:gh, :, :], 3)
    den = (jnp.sqrt(jnp.sum(h_edges[:, :, 0:gh - 1, :, :] ** 2, 3))
           * jnp.sqrt(jnp.sum(h_edges[:, :, 1:gh, :, :] ** 2, 3)))
    dh = 1.0 - num / den                       # [B, T, gh-1, 2] reduced cols
    dh = dh[:, :, :, 0:gw] + dh[:, :, :, 1:gw + 1]
    return jnp.mean(dw) + jnp.mean(dh)


def intra_grid_loss(mesh: jnp.ndarray, model_h: int = MODEL_H,
                    model_w: int = MODEL_W) -> jnp.ndarray:
    """Penalty on grid cells stretched beyond 2x nominal size (loss.py:109-122)."""
    gh, gw = mesh.shape[-3] - 1, mesh.shape[-2] - 1
    max_w = model_w / gw * 2.0
    max_h = model_h / gh * 2.0
    dx = mesh[..., :, 1:gw + 1, 0] - mesh[..., :, 0:gw, 0]
    dy = mesh[..., 1:gh + 1, :, 1] - mesh[..., 0:gh, :, 1]
    return (jnp.mean(jnp.maximum(dx - max_w, 0.0))
            + jnp.mean(jnp.maximum(dy - max_h, 0.0)))


# ---------------------------------------------------------------------------
# spatial stage
# ---------------------------------------------------------------------------


def spatial_photometric_loss(out_H_ref, out_H_tgt, out_tps_ref, out_tps_tgt
                             ) -> jnp.ndarray:
    """3x homography-stage + 1x TPS-stage masked L1 (loss.py:53-66).

    Inputs: [B, H, W, 4] (3 image channels + warp mask).
    """
    ov_h = (out_H_ref[..., 3] * out_H_tgt[..., 3])[..., None]
    l1 = l_num_loss(out_H_ref[..., :3] * ov_h, out_H_tgt[..., :3] * ov_h, 1)
    ov_t = (out_tps_ref[..., 3] * out_tps_tgt[..., 3])[..., None]
    l2 = l_num_loss(out_tps_ref[..., :3] * ov_t, out_tps_tgt[..., :3] * ov_t, 1)
    return 3.0 * l1 + 1.0 * l2


def perceptual_loss(vgg_apply, out_H_ref, out_H_tgt, out_tps_ref, out_tps_tgt
                    ) -> jnp.ndarray:
    """VGG relu3_2 masked L1, 3x homography + 1x TPS stage (loss.py:28-46).

    ``vgg_apply(img_255) -> [B, H/4, W/4, 256]``. Overlap masks are
    bicubic-resized (align_corners=False) to the feature resolution.
    """
    from stabstitch2_tpu.ops.resize import resize_bicubic

    def term(ref, tgt):
        ov = (ref[..., 3] * tgt[..., 3])[..., None]
        fh, fw = ref.shape[1] // 4, ref.shape[2] // 4
        ov = resize_bicubic(ov, (fh, fw), align_corners=False)
        f_ref = vgg_apply((ref[..., :3] + 1.0) * 127.5)
        f_tgt = vgg_apply((tgt[..., :3] + 1.0) * 127.5)
        return l_num_loss(f_ref * ov, f_tgt * ov, 1)

    return 3.0 * term(out_H_ref, out_H_tgt) + 1.0 * term(out_tps_ref, out_tps_tgt)


# ---------------------------------------------------------------------------
# temporal stage
# ---------------------------------------------------------------------------


def temporal_photometric_loss(img_prev: jnp.ndarray,
                              warped_next: jnp.ndarray) -> jnp.ndarray:
    """L1 between frame t-1 and the TPS-warped frame t on the warp mask.

    img_prev: [B, H, W, 3]; warped_next: [B, H, W, 6] (3 warped img + 3 mask,
    TemporalWarp/Codes/loss.py:15-23).
    """
    warp = warped_next[..., 0:3]
    mask = warped_next[..., 3:6]
    return l_num_loss(img_prev * mask, warp * mask, 1)


# ---------------------------------------------------------------------------
# smooth stage
# ---------------------------------------------------------------------------


def brightness_balanced_l1(wimg1, wimg2, overlap) -> jnp.ndarray:
    """Mean-brightness-balanced masked L1 (SmoothWarp/Codes/loss.py:11-19).

    wimg*: [B, H, W, 3]; overlap: [B, H, W, 1].
    """
    num = jnp.sum(wimg1 * overlap - wimg2 * overlap, axis=(1, 2))
    den = jnp.sum(overlap, axis=(1, 2))
    delta = (num / den)[:, None, None, :]
    return l_num_loss(wimg1 * overlap, (wimg2 + delta) * overlap, 1)


def path_smoothness_loss(path: jnp.ndarray,
                         weights: Sequence[float] = (0.9, 0.3, 0.1)
                         ) -> jnp.ndarray:
    """Weighted +-1/2/3-neighbor L2 around the window center.

    path: [B, T, GH+1, GW+1, 2] with T >= 7 (train_ssd.py:152-173).
    """
    mid = path[:, 3:-3]
    total = 0.0
    for k, w in enumerate((weights[2], weights[1], weights[0])):
        # k=0 -> offset 3 (weight .1), k=1 -> offset 2 (.3), k=2 -> offset 1 (.9)
        off = 3 - k
        left = path[:, 3 - off:path.shape[1] - 3 - off]
        right = path[:, 3 + off:path.shape[1] - 3 + off or None]
        total = total + (l_num_loss(left, mid, 2) + l_num_loss(right, mid, 2)) * w
    return total


def online_collaboration_loss(paths: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Disagreement of overlapping shifted windows (train_ssd.py:197-200).

    ``paths`` are already re-based into a common trajectory origin.
    """
    total = 0.0
    for k in range(len(paths) - 1):
        total = total + l_num_loss(paths[k][:, 1:], paths[k + 1][:, :-1], 2)
    return total
