"""Checkpointing: orbax-backed training state + the inference triad bundle.

Parity targets:
- training checkpoints with model/optimizer/epoch/step and auto-resume from
  the latest file (reference train_ssd.py:53-68, :214-219);
- inference expects exactly the triad spatial_warp / temporal_warp /
  smooth_warp (test_online_ssd.py:176-191) — here one directory with three
  subtrees, plus a converter from reference ``.pth`` files
  (utils/torch_import.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class TrainCheckpointer:
    """Step-numbered checkpoints with keep-latest + auto-resume."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, payload: Dict[str, Any]) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(
            _to_numpy_tree(payload)))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: Dict[str, Any],
                step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(_to_numpy_tree(template)))


# ---------------------------------------------------------------------------
# inference triad bundle
# ---------------------------------------------------------------------------

TRIAD_KEYS = ("spatial", "temporal", "smooth")


def save_triad(directory: str, spatial_vars, temporal_vars,
               smooth_vars) -> None:
    directory = os.path.abspath(directory)
    payload = {"spatial": _to_numpy_tree(spatial_vars),
               "temporal": _to_numpy_tree(temporal_vars),
               "smooth": _to_numpy_tree(smooth_vars)}
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(directory, "triad"), payload, force=True)
    ckpt.wait_until_finished()


def load_triad(directory: str, spatial_template, temporal_template,
               smooth_template):
    ckpt = ocp.StandardCheckpointer()
    payload = ckpt.restore(
        os.path.join(os.path.abspath(directory), "triad"),
        {"spatial": _to_numpy_tree(spatial_template),
         "temporal": _to_numpy_tree(temporal_template),
         "smooth": _to_numpy_tree(smooth_template)})
    return payload["spatial"], payload["temporal"], payload["smooth"]


def triad_from_reference(model_dir: str):
    """Convert the reference's spatial_warp/temporal_warp/smooth_warp.pth.

    ``model_dir`` mirrors the reference's full_model_ssd/ layout
    (test_online_ssd.py:176-191). Returns (spatial, temporal, smooth)
    variable dicts for our Flax modules.
    """
    from stabstitch2_tpu.utils.torch_import import convert_reference_checkpoint

    spatial = convert_reference_checkpoint(
        os.path.join(model_dir, "spatial_warp.pth"), "spatial")
    temporal = convert_reference_checkpoint(
        os.path.join(model_dir, "temporal_warp.pth"), "temporal")
    smooth = convert_reference_checkpoint(
        os.path.join(model_dir, "smooth_warp.pth"), "smooth")
    return spatial, temporal, smooth


def stitcher_from_checkpoint(ckpt_dir: Optional[str] = None,
                             reference_pth_dir: Optional[str] = None,
                             **stitcher_kwargs):
    """Build a VideoStitcher from an orbax triad or reference .pth triad."""
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher

    # fail fast on missing checkpoints, before the (slow) model init
    if reference_pth_dir:
        missing = [n for n in ("spatial_warp.pth", "temporal_warp.pth",
                               "smooth_warp.pth")
                   if not os.path.exists(os.path.join(reference_pth_dir, n))]
        if missing:  # reference exits with 'No checkpoint found!'
            raise FileNotFoundError(
                f"reference triad incomplete in {reference_pth_dir}: "
                f"missing {missing}")
    elif ckpt_dir and not os.path.exists(os.path.join(ckpt_dir, "triad")):
        raise FileNotFoundError(f"no triad checkpoint under {ckpt_dir}")

    stitcher = init_stitcher(**stitcher_kwargs)
    if reference_pth_dir:
        sv, tv, mv = triad_from_reference(reference_pth_dir)
    elif ckpt_dir:
        sv, tv, mv = load_triad(ckpt_dir, stitcher.spatial_vars,
                                stitcher.temporal_vars, stitcher.smooth_vars)
    else:
        return stitcher
    return type(stitcher)(stitcher.spatial_net, sv, stitcher.temporal_net,
                          tv, stitcher.smooth_net, mv,
                          config=stitcher.config, chunk=stitcher.chunk,
                          model_h=stitcher.model_h, model_w=stitcher.model_w,
                          upload_mode=stitcher.upload_mode,
                          mesh=stitcher.mesh)
