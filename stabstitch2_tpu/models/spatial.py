"""SpatialWarp network: two-frame cross-view alignment.

Parity target: ``Network`` in SpatialWarp/Codes/network.py:180-461 and its
inference twin ``SpatialNet`` (Full_model_inference/Codes/spatial_network.py).

Stage 1: shared ResNet-18 features at H/16 -> CCL correlation flow -> conv+FC
head -> 4-pt homography motion (8 values). Bidirectional split: H from the
full motion, H_tgt from half the motion, H_ref = H^-1 H_tgt, all at 1/8
scale; both H/8 feature maps are homography-warped toward the virtual middle
plane. Stage 2: two cost volumes (search_range=5 -> 121ch) -> separate ref /
tgt conv+FC heads -> residual TPS mesh motions for BOTH views.

The geometry (DLT, warps, mesh algebra) lives in ``stabstitch2_tpu.ops``;
this module is the learnable part plus the motion assembly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stabstitch2_tpu.config import GRID_H, GRID_W
from stabstitch2_tpu.models.backbone import (
    ConvHead,
    MLPHead,
    ResNetStage1,
    ResNetStage2,
)
from stabstitch2_tpu.ops import (
    ccl_flow,
    h2mesh,
    homo_warp,
    normalize_homography,
    solve_dlt,
)
from stabstitch2_tpu.ops.cost_volume import cost_volume_auto
from stabstitch2_tpu.ops.mesh import rigid_mesh


def corner_points(img_h: float, img_w: float, batch: int,
                  dtype=jnp.float32) -> jnp.ndarray:
    """The four image corners [B,4,2] in the reference's order (TL,TR,BL,BR)."""
    pts = jnp.array([[0.0, 0.0], [img_w, 0.0], [0.0, img_h], [img_w, img_h]],
                    dtype)
    return jnp.broadcast_to(pts[None], (batch, 4, 2))


def bidirectional_homographies(H_motion: jnp.ndarray, img_h: float,
                               img_w: float, scale: float = 1.0
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a 4-pt motion into the (H_ref, H_tgt) middle-plane pair.

    H_motion: [B, 4, 2]. dst_tgt = src + motion/2; H_tgt maps src->dst_tgt,
    H_ref = H^{-1} H_tgt (reference network.py:122-125,335-339). ``scale``
    divides the point coordinates first (the reference solves at 1/8 scale
    inside the network forward).
    """
    B = H_motion.shape[0]
    src = corner_points(img_h, img_w, B, H_motion.dtype) / scale
    dst = src + H_motion / scale
    dst_tgt = src + (H_motion / 2.0) / scale
    H = solve_dlt(src, dst)
    H_tgt = solve_dlt(src, dst_tgt)
    H_ref = jnp.einsum("bij,bjk->bik", jnp.linalg.inv(H), H_tgt)
    return H_ref, H_tgt


class SpatialNet(nn.Module):
    """Returns (H_motion[B,8], mesh_motion_ref, mesh_motion_tgt [B,GH+1,GW+1,2])."""

    dtype: Any = jnp.float32
    grid_h: int = GRID_H
    grid_w: int = GRID_W
    # None = auto: fused Pallas cost volume on TPU (measured 3.8x at
    # sr=5, ops.cost_volume_auto); set False to force the jnp formulation
    use_pallas_corr: bool | None = None
    # jax.sharding.Mesh for dp (GSPMD) programs: the kernel is shard_map-
    # wrapped over the 'data' axis so multi-chip inference keeps it
    # (ops.cost_volume_auto)
    corr_shard_mesh: Any = None

    def setup(self):
        mesh_out = (self.grid_h + 1) * (self.grid_w + 1) * 2
        self.stage1 = ResNetStage1(dtype=self.dtype)
        self.stage2 = ResNetStage2(dtype=self.dtype)
        self.regress1_conv = ConvHead((64, 128, 128), dtype=self.dtype)
        self.regress1_fc = MLPHead((512, 128, 8), dtype=self.dtype)
        self.regress2_conv_ref = ConvHead((64, 128, 128, 256), dtype=self.dtype)
        self.regress2_fc_ref = MLPHead((1024, 512, mesh_out), dtype=self.dtype)
        self.regress2_conv_tgt = ConvHead((64, 128, 128, 256), dtype=self.dtype)
        self.regress2_fc_tgt = MLPHead((1024, 512, mesh_out), dtype=self.dtype)

    def __call__(self, img1, img2, train: bool = False):
        B, img_h, img_w, _ = img1.shape

        f1_8 = self.stage1(img1, train)   # [B, H/8, W/8, 128]
        f1_16 = self.stage2(f1_8, train)  # [B, H/16, W/16, 256]
        f2_8 = self.stage1(img2, train)
        f2_16 = self.stage2(f2_8, train)

        # stage 1: global 4-pt homography from CCL correlation flow
        flow = ccl_flow(f1_16.astype(jnp.float32), f2_16.astype(jnp.float32))
        h1 = self.regress1_conv(flow)
        offset_1 = self.regress1_fc(h1).astype(jnp.float32)  # [B, 8]

        # bidirectional decomposition at 1/8 scale + feature warping
        H_ref, H_tgt = bidirectional_homographies(
            offset_1.reshape(B, 4, 2), img_h, img_w, scale=8.0)
        h8, w8 = img_h // 8, img_w // 8
        theta_ref = normalize_homography(H_ref, h8, w8)
        theta_tgt = normalize_homography(H_tgt, h8, w8)
        wf1 = homo_warp(f1_8.astype(jnp.float32), theta_ref, (h8, w8))
        wf2 = homo_warp(f2_8.astype(jnp.float32), theta_tgt, (h8, w8))

        # stage 2: residual mesh motion per view
        corr_ref = cost_volume_auto(wf1, wf2, search_range=5,
                                    use_pallas=self.use_pallas_corr,
                                    shard_mesh=self.corr_shard_mesh)
        offset_ref = self.regress2_fc_ref(self.regress2_conv_ref(corr_ref))
        corr_tgt = cost_volume_auto(wf2, wf1, search_range=5,
                                    use_pallas=self.use_pallas_corr,
                                    shard_mesh=self.corr_shard_mesh)
        offset_tgt = self.regress2_fc_tgt(self.regress2_conv_tgt(corr_tgt))

        mesh_shape = (B, self.grid_h + 1, self.grid_w + 1, 2)
        return (offset_1,
                offset_ref.astype(jnp.float32).reshape(mesh_shape),
                offset_tgt.astype(jnp.float32).reshape(mesh_shape))


def spatial_motions(H_motion: jnp.ndarray, mesh_motion_ref: jnp.ndarray,
                    mesh_motion_tgt: jnp.ndarray, img_h: float, img_w: float
                    ) -> Dict[str, jnp.ndarray]:
    """Assemble per-view full-resolution warping meshes from net outputs.

    Mirrors the inference wrapper ``build_SpatialNet``
    (Full_model_inference/Codes/spatial_network.py:63-118): solve the
    full-res bidirectional pair, pull the rigid lattice through each, add
    the residual mesh motions, and report motions relative to the rigid
    mesh. Returns dict with ``motion1``/``motion2`` [B, GH+1, GW+1, 2] and
    the meshes/homographies for reuse.
    """
    B = H_motion.shape[0]
    H_ref, H_tgt = bidirectional_homographies(
        H_motion.reshape(B, 4, 2), img_h, img_w)
    rigid = rigid_mesh(img_h, img_w, dtype=H_motion.dtype)
    mesh_ref = h2mesh(H_ref, rigid) + mesh_motion_ref
    mesh_tgt = h2mesh(H_tgt, rigid) + mesh_motion_tgt
    return {
        "motion1": mesh_ref - rigid[None],
        "motion2": mesh_tgt - rigid[None],
        "mesh_ref": mesh_ref,
        "mesh_tgt": mesh_tgt,
        "mesh_rigid": rigid,
        "H_ref": H_ref,
        "H_tgt": H_tgt,
    }
