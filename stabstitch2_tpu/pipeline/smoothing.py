"""Sliding-window smoothing: every window of the video in one batch.

Parity target: the window loop in the reference driver
(Full_model_inference/Codes/test_online_ssd.py:359-392): window k covers
frames [k, k+7); tsmotion[k] is zeroed per window (each window's trajectory
starts at its own origin); the full first window is kept, every later
window contributes only its last frame.

TPU-first: the reference runs SmoothNet once per window sequentially. The
windows are independent at inference, so here they are gathered into a
[num_windows, T, ...] batch and run through SmoothNet in large chunks —
one forward per ~chunk instead of per frame.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from stabstitch2_tpu.models.smooth import SmoothNet, smooth_outputs


def window_indices(num_frames: int, window: int) -> jnp.ndarray:
    """[num_windows, window] gather indices: row k = k .. k+window-1."""
    num_windows = num_frames - window + 1
    base = jnp.arange(num_windows)[:, None]
    return base + jnp.arange(window)[None, :]


def gather_windows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: [T, ...] -> [num_windows, window, ...]."""
    return x[idx]


def smooth_all_windows(net: SmoothNet, variables, smesh1, smesh2,
                       tsmotion1, tsmotion2, window: int = 7,
                       chunk: int = 64) -> Dict[str, jnp.ndarray]:
    """Run SmoothNet on all sliding windows and assemble per-frame outputs.

    smesh*, tsmotion*: [T, GH+1, GW+1, 2] (single video, both views).
    Returns dict of [T, GH+1, GW+1, 2]: smooth_mesh1/2, ori_mesh1/2, plus
    the window-0 paths (for metrics).
    """
    T = smesh1.shape[0]
    assert T >= window, f"need at least {window} frames, got {T}"
    idx = window_indices(T, window)
    nw = idx.shape[0]

    w_smesh1 = gather_windows(smesh1, idx)
    w_smesh2 = gather_windows(smesh2, idx)
    w_ts1 = gather_windows(tsmotion1, idx)
    w_ts2 = gather_windows(tsmotion2, idx)
    # each window's trajectory starts at zero (driver zeroes element 0,
    # test_online_ssd.py:361-365)
    w_ts1 = w_ts1.at[:, 0].set(0.0)
    w_ts2 = w_ts2.at[:, 0].set(0.0)

    outs = []
    for s in range(0, nw, chunk):
        e = min(s + chunk, nw)
        raw = net.apply(variables, w_smesh1[s:e], w_smesh2[s:e],
                        w_ts1[s:e], w_ts2[s:e])
        outs.append(smooth_outputs(raw))
    d = {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}

    def assemble(per_window):  # [nw, window, ...] -> [T, ...]
        head = per_window[0]               # frames 0..window-1
        tail = per_window[1:, -1]          # frame k+window-1 for k >= 1
        return jnp.concatenate([head, tail], axis=0)

    return {
        "smooth_mesh1": assemble(d["smooth_mesh1"]),
        "smooth_mesh2": assemble(d["smooth_mesh2"]),
        "ori_mesh1": assemble(d["ori_mesh1"]),
        "ori_mesh2": assemble(d["ori_mesh2"]),
        # per-window paths (window-local trajectories) for the metric harness
        "win_ori_path1": d["ori_path1"],
        "win_ori_path2": d["ori_path2"],
        "win_smooth_path1": d["smooth_path1"],
        "win_smooth_path2": d["smooth_path2"],
    }
