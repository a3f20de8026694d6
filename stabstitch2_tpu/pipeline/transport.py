"""Temporal-motion transport into the stitched (spatially-aligned) frame.

Parity target: the tsmotion preparation block that the reference repeats in
five places (SmoothWarp/Codes/network.py:91-122,
test_online_ssd.py:306-347, ...):

for each frame t >= 1:
    tsmesh_t  = TPS_point(norm(rigid + tmotion_t);  rigid -> norm(smesh_{t-1}))
    tsmotion_t = denorm(tsmesh_t) - smesh_t
with tsmotion_0 = 0.

TPU-first: all frames transported in ONE batched call — the TPS system has
the rigid lattice as its source everywhere, so the matrix is factored once
(ops.tps.tps_params_shared_source) and the per-frame work is two matmuls.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stabstitch2_tpu.ops.mesh import (
    denormalize_mesh,
    mesh_points,
    normalize_mesh,
    points_mesh,
    rigid_mesh,
)
from stabstitch2_tpu.ops.tps import tps_params_shared_source, tps_transform_points


def transport_temporal_motion(tmotion: jnp.ndarray, smotion: jnp.ndarray,
                              img_h: int, img_w: int) -> jnp.ndarray:
    """tmotion, smotion: [T, GH+1, GW+1, 2] for one view -> tsmotion [T, ...].

    tmotion[t] warps frame t toward frame t-1 in the ORIGINAL frame; the
    output expresses it relative to the stitched meshes smesh = rigid +
    smotion.
    """
    T = tmotion.shape[0]
    rigid = rigid_mesh(img_h, img_w, dtype=tmotion.dtype)
    norm_rigid_pts = mesh_points(normalize_mesh(rigid, img_h, img_w))

    smesh = rigid[None] + smotion                      # [T, GH+1, GW+1, 2]
    tmesh = rigid[None] + tmotion
    norm_smesh = normalize_mesh(smesh, img_h, img_w)
    norm_tmesh = normalize_mesh(tmesh, img_h, img_w)

    # frames 1..T-1: spline rigid -> smesh_{t-1}, evaluated at tmesh_t
    targets = mesh_points(norm_smesh[:-1])             # [T-1, P, 2]
    points = mesh_points(norm_tmesh[1:])               # [T-1, P, 2]
    Tc = tps_params_shared_source(norm_rigid_pts, targets)
    src_b = jnp.broadcast_to(norm_rigid_pts[None], targets.shape)
    tsmesh = tps_transform_points(points, src_b, targets, T=Tc)  # [T-1, P, 2]

    gh, gw = tmotion.shape[1] - 1, tmotion.shape[2] - 1
    tsmesh = points_mesh(tsmesh, grid_h=gh, grid_w=gw)
    tsmotion_rest = denormalize_mesh(tsmesh, img_h, img_w) - smesh[1:]
    zero = jnp.zeros_like(tsmotion_rest[:1])
    return jnp.concatenate([zero, tsmotion_rest], axis=0)


def stitched_meshes(smotion: jnp.ndarray, img_h: int, img_w: int
                    ) -> jnp.ndarray:
    """smesh = rigid + smotion, batched over frames."""
    rigid = rigid_mesh(img_h, img_w, dtype=smotion.dtype)
    return rigid[None] + smotion


def transport_both_views(tmotion1, smotion1, tmotion2, smotion2,
                         img_h: int, img_w: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transport for both views (each view's t/t-1 coupling kept separate)."""
    ts1 = transport_temporal_motion(tmotion1, smotion1, img_h, img_w)
    ts2 = transport_temporal_motion(tmotion2, smotion2, img_h, img_w)
    return ts1, ts2
