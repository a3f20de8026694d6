"""SmoothWarp network: joint two-view warp smoothing over a T-frame window.

Parity target: ``Network``/``MotionPrediction``
(SmoothWarp/Codes/network.py:184-307) and the inference twin ``SmoothNet``
(Full_model_inference/Codes/smooth_network.py:47-157).

Inputs per view: the stitched meshes ``smesh`` [B,T,GH+1,GW+1,2] and the
transported temporal motions ``tsmotion`` (same shape). The net cumsums
tsmotion into trajectory paths, embeds meshes and paths pointwise
(Linear 2->32 each), concatenates both views into 128 channels, runs three
Conv3D(128,(5,3,3)) layers over (T, grid_h, grid_w), and decodes per-view
delta flows with a Linear(128->4).

TPU notes: Conv3D over a 7x7x9 lattice is tiny — the win is batching many
sliding windows at once (pipeline/smoothing.py), which turns the window
loop of the reference driver into one [num_windows, T, ...] batch.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stabstitch2_tpu.config import GRID_H, GRID_W


class MotionPrediction(nn.Module):
    """Embed -> Conv3D x3 -> decode (reference network.py:254-307)."""

    dtype: Any = jnp.float32
    kernel_t: int = 5

    @nn.compact
    def __call__(self, smesh1, smesh2, tsflow1, tsflow2):
        # all inputs [B, T, GH+1, GW+1, 2]
        embed_mesh = nn.Dense(32, dtype=self.dtype, name="embed_mesh_fc")
        embed_flow = nn.Dense(32, dtype=self.dtype, name="embed_flow_fc")
        # the reference shares embedding1/embedding3 across views
        h1 = jnp.concatenate([nn.relu(embed_mesh(smesh1.astype(self.dtype))),
                              nn.relu(embed_flow(tsflow1.astype(self.dtype)))], -1)
        h2 = jnp.concatenate([nn.relu(embed_mesh(smesh2.astype(self.dtype))),
                              nn.relu(embed_flow(tsflow2.astype(self.dtype)))], -1)
        h = jnp.concatenate([h1, h2], -1)  # [B, T, H, W, 128]

        pad_t = self.kernel_t // 2
        for i in range(3):
            h = nn.Conv(128, (self.kernel_t, 3, 3),
                        padding=((pad_t, pad_t), (1, 1), (1, 1)),
                        dtype=self.dtype, name=f"conv3d_{i}")(h)
            h = nn.relu(h)
        delta = nn.Dense(4, dtype=self.dtype, name="decode_fc")(h)
        return delta.astype(jnp.float32)  # [B, T, H, W, 4]


class SmoothNet(nn.Module):
    """Returns (stitch_mesh1, stitch_mesh2, ori_path1, ori_path2, d1, d2).

    smesh/tsmotion inputs are [B, T, GH+1, GW+1, 2] (time already stacked —
    the reference passes python lists and stacks internally,
    SmoothWarp/Codes/network.py:201-247).
    """

    dtype: Any = jnp.float32
    grid_h: int = GRID_H
    grid_w: int = GRID_W

    @nn.compact
    def __call__(self, smesh1, smesh2, tsmotion1, tsmotion2
                 ) -> Tuple[jnp.ndarray, ...]:
        # trajectory = cumulative sum of transported temporal motions
        tsflow1 = jnp.cumsum(tsmotion1, axis=1)
        tsflow2 = jnp.cumsum(tsmotion2, axis=1)
        delta = MotionPrediction(dtype=self.dtype, name="motion_pre")(
            smesh1, smesh2, tsflow1, tsflow2)
        delta1, delta2 = delta[..., 0:2], delta[..., 2:4]
        return smesh1, smesh2, tsflow1, tsflow2, delta1, delta2


def smooth_outputs(net_outputs) -> dict:
    """Post-process raw net outputs into the inference dict.

    Mirrors ``build_SmoothNet`` (smooth_network.py:23-41):
    smooth_path = ori_path + delta; smooth_mesh = ori_mesh - delta.
    """
    smesh1, smesh2, path1, path2, d1, d2 = net_outputs
    return {
        "ori_mesh1": smesh1, "ori_mesh2": smesh2,
        "ori_path1": path1, "ori_path2": path2,
        "smooth_path1": path1 + d1, "smooth_path2": path2 + d2,
        "smooth_mesh1": smesh1 - d1, "smooth_mesh2": smesh2 - d2,
    }
