"""TemporalWarp network: inter-frame mesh motion for one view.

Parity target: ``Network`` (TemporalWarp/Codes/network.py:118-193) and the
sequential inference twin ``TemporalNet``
(Full_model_inference/Codes/temporal_network.py:60-147).

TPU-first redesign of the inference path: the reference walks the video
frame-by-frame, caching the previous frame's backbone features between
iterations. Features do not depend on predictions, so here the whole clip
is one batch — ``features()`` over all T frames at once, then
``motion_from_features`` on the [0:T-1] vs [1:T] slices. No scan, no
sequential dependency; each frame's backbone runs exactly once, like the
reference's cache but fully parallel.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from stabstitch2_tpu.config import GRID_H, GRID_W
from stabstitch2_tpu.models.backbone import ConvHead, MLPHead, ResNetStage1
from stabstitch2_tpu.ops.cost_volume import cost_volume_auto


class TemporalNet(nn.Module):
    """Backbone + cost volume (sr=3 -> 49ch) + conv/FC head -> mesh motion.

    ``use_pallas_corr``: None = auto (fused Pallas cost volume on TPU,
    a measured 3.8x at sr=5 — see ops.cost_volume_auto); set False to
    force the jnp formulation. ``corr_shard_mesh``: mesh for dp (GSPMD)
    programs — the kernel is shard_map-wrapped over the 'data' axis.
    """

    dtype: Any = jnp.float32
    grid_h: int = GRID_H
    grid_w: int = GRID_W
    use_pallas_corr: bool | None = None
    corr_shard_mesh: Any = None

    def setup(self):
        mesh_out = (self.grid_h + 1) * (self.grid_w + 1) * 2
        self.stage1 = ResNetStage1(dtype=self.dtype)
        self.regress_conv = ConvHead((64, 128, 128, 256), dtype=self.dtype)
        self.regress_fc = MLPHead((1024, 512, mesh_out), dtype=self.dtype)

    def features(self, img, train: bool = False):
        """Backbone features at H/8 for a batch of frames [B,H,W,3]."""
        return self.stage1(img, train)

    def motion_from_features(self, feat_prev, feat_next):
        """Mesh motion warping frame t toward frame t-1.

        feat_prev/feat_next: [B, H/8, W/8, 128]. Returns [B, GH+1, GW+1, 2].
        """
        corr = cost_volume_auto(feat_prev.astype(jnp.float32),
                                feat_next.astype(jnp.float32),
                                search_range=3,
                                use_pallas=self.use_pallas_corr,
                                shard_mesh=self.corr_shard_mesh)
        offset = self.regress_fc(self.regress_conv(corr))
        return offset.astype(jnp.float32).reshape(
            -1, self.grid_h + 1, self.grid_w + 1, 2)

    def __call__(self, img_prev, img_next, train: bool = False):
        """Pairwise form (training parity with reference forward)."""
        f1 = self.features(img_prev, train)
        f2 = self.features(img_next, train)
        return self.motion_from_features(f1, f2)


def clip_motions(net: TemporalNet, params, frames: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
    """Whole-clip temporal motion, batched.

    frames: [T, H, W, 3]. Returns motions [T, GH+1, GW+1, 2] with a zero
    motion prepended for frame 0 (reference ``build_TemporalNet``,
    temporal_network.py:23-34).
    """
    feats = net.apply(params, frames, train, method=TemporalNet.features)
    motion = net.apply(params, feats[:-1], feats[1:],
                       method=TemporalNet.motion_from_features)
    zero = jnp.zeros_like(motion[:1])
    return jnp.concatenate([zero, motion], axis=0)
