"""Stability and distortion scores + cross-window path continuation.

Parity target: test_metric_ssd.py:
- path continuation (:420-437): window 0 contributes its whole trajectory;
  each later window k appends
    ori[t]    = ori[t-1] + (win_ori[k][-1] - win_ori[k][-2])
    smooth[t] = ori[t]   + (win_smooth[k][-1] - win_ori[k][-1])
  (the smooth value is rebased onto the CONTINUED original path).
- stability (:444-469): the 0.9/0.3/0.1-weighted neighbor-L2 smoothness of
  the continued smooth path (view 2).
- distortion (:473-501): max over frames of the (reference-quirk 5-D)
  inter_grid_loss + intra_grid_loss of the per-frame smooth mesh (view 2).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from stabstitch2_tpu.train.losses import (
    inter_grid_loss_5d_ref,
    intra_grid_loss,
    path_smoothness_loss,
)


def continue_paths(win_ori: jnp.ndarray, win_smooth: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """win_*: [num_windows, window, GH+1, GW+1, 2] -> full [T, ...] paths."""
    window = win_ori.shape[1]
    ori_head = win_ori[0]                   # frames 0 .. window-1
    deltas = win_ori[1:, -1] - win_ori[1:, -2]
    ori_tail = ori_head[-1][None] + jnp.cumsum(deltas, axis=0)
    ori = jnp.concatenate([ori_head, ori_tail], axis=0)

    smooth_head = win_smooth[0]
    smooth_tail = ori_tail + (win_smooth[1:, -1] - win_ori[1:, -1])
    smooth = jnp.concatenate([smooth_head, smooth_tail], axis=0)
    return ori, smooth


def stability_score(path: jnp.ndarray) -> jnp.ndarray:
    """Weighted neighbor-L2 smoothness. path: [T, GH+1, GW+1, 2], T >= 7.

    Same +-1/2/3 recurrence the smooth trainer optimizes — delegate so the
    published metric can never drift from the training objective."""
    return path_smoothness_loss(path[None])


def distortion_score(mesh_seq: jnp.ndarray) -> jnp.ndarray:
    """Max over frames of inter+intra grid loss. mesh_seq: [T, GH+1, GW+1, 2]."""
    per_frame = []
    for k in range(mesh_seq.shape[0]):
        m = mesh_seq[k][None, None]  # [1, 1, GH+1, GW+1, 2]
        per_frame.append(inter_grid_loss_5d_ref(m) + intra_grid_loss(m))
    return jnp.max(jnp.stack(per_frame))
