"""Convert reference / torchvision checkpoints into Flax parameter trees.

The reference ships ``.pth`` files with ``{'model': state_dict, ...}``
(e.g. saved at SpatialWarp/Codes/train_ssd.py:214-219); inference expects
the triad spatial_warp.pth / temporal_warp.pth / smooth_warp.pth
(test_online_ssd.py:176-191). This module maps those state_dicts (torch
naming, NCHW kernels) onto our Flax modules (NHWC kernels) so converted
checkpoints reproduce the reference outputs bit-for-bit up to conv-layout
transposes.

Layout rules:
- conv2d weight  [O,I,kh,kw]    -> [kh,kw,I,O]
- conv3d weight  [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]
- linear weight  [O,I]          -> [I,O]
- batchnorm weight/bias -> scale/bias (params); running_mean/var -> batch_stats

The first Dense after a conv stack needs no index shuffling because
MLPHead flattens in C,H,W order (models/backbone.py).

Works on numpy arrays: pass ``{k: v.numpy() for k, v in sd.items()}`` or let
:func:`load_torch_state_dict` do it (requires torch, CPU-only is fine).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# name-mapping tables
# ---------------------------------------------------------------------------


def _block_entries(torch_prefix: str, flax_prefix: str):
    """Entries for one torchvision BasicBlock."""
    out = [
        (f"{torch_prefix}.conv1", f"{flax_prefix}/conv1", "conv"),
        (f"{torch_prefix}.bn1", f"{flax_prefix}/bn1", "bn"),
        (f"{torch_prefix}.conv2", f"{flax_prefix}/conv2", "conv"),
        (f"{torch_prefix}.bn2", f"{flax_prefix}/bn2", "bn"),
        (f"{torch_prefix}.downsample.0", f"{flax_prefix}/downsample_conv", "conv"),
        (f"{torch_prefix}.downsample.1", f"{flax_prefix}/downsample_bn", "bn"),
    ]
    return out


def _stage1_entries(torch_prefix: str, flax_prefix: str):
    """Reference Sequential stage1: [conv1, bn1, relu, maxpool, layer1, layer2]."""
    out = [
        (f"{torch_prefix}.0", f"{flax_prefix}/conv1", "conv"),
        (f"{torch_prefix}.1", f"{flax_prefix}/bn1", "bn"),
    ]
    for i in range(2):
        out += _block_entries(f"{torch_prefix}.4.{i}", f"{flax_prefix}/layer1_{i}")
        out += _block_entries(f"{torch_prefix}.5.{i}", f"{flax_prefix}/layer2_{i}")
    return out


def _conv_head_entries(torch_prefix: str, flax_prefix: str, num_stages: int):
    """Reference head Sequential: conv,relu,conv,relu,pool per stage."""
    out = []
    idx = 0
    for si in range(num_stages):
        out.append((f"{torch_prefix}.{idx}", f"{flax_prefix}/conv{si}_0", "conv"))
        out.append((f"{torch_prefix}.{idx+2}", f"{flax_prefix}/conv{si}_1", "conv"))
        idx += 5  # conv, relu, conv, relu, pool
    return out


def _mlp_entries(torch_prefix: str, flax_prefix: str, num_layers: int = 3):
    return [(f"{torch_prefix}.{2*i}", f"{flax_prefix}/fc{i}", "linear")
            for i in range(num_layers)]


def spatial_mapping():
    m = _stage1_entries("feature_extractor_stage1", "stage1")
    for i in range(2):
        m += _block_entries(f"feature_extractor_stage2.0.{i}", f"stage2/layer3_{i}")
    m += _conv_head_entries("regressNet1_part1", "regress1_conv", 3)
    m += _mlp_entries("regressNet1_part2", "regress1_fc")
    m += _conv_head_entries("regressNet2_part1_ref", "regress2_conv_ref", 4)
    m += _mlp_entries("regressNet2_part2_ref", "regress2_fc_ref")
    m += _conv_head_entries("regressNet2_part1_tgt", "regress2_conv_tgt", 4)
    m += _mlp_entries("regressNet2_part2_tgt", "regress2_fc_tgt")
    return m


def temporal_mapping():
    # the reference TemporalNet instantiates stage2 but never calls it
    # (TemporalWarp/Codes/network.py:181-192) — those keys are skipped.
    m = _stage1_entries("feature_extractor_stage1", "stage1")
    m += _conv_head_entries("regressNet2_part1", "regress_conv", 4)
    m += _mlp_entries("regressNet2_part2", "regress_fc")
    return m


def smooth_mapping():
    # embedding2 exists in the reference but is dead code
    # (SmoothWarp/Codes/network.py:262-265, commented-out call sites).
    return [
        ("MotionPre.embedding1.0", "motion_pre/embed_mesh_fc", "linear"),
        ("MotionPre.embedding3.0", "motion_pre/embed_flow_fc", "linear"),
        ("MotionPre.MotionConv3D.0", "motion_pre/conv3d_0", "conv3d"),
        ("MotionPre.MotionConv3D.2", "motion_pre/conv3d_1", "conv3d"),
        ("MotionPre.MotionConv3D.4", "motion_pre/conv3d_2", "conv3d"),
        ("MotionPre.decoding.0", "motion_pre/decode_fc", "linear"),
    ]


def torchvision_resnet18_mapping(flax_prefix_stage1="stage1",
                                 flax_prefix_stage2="stage2"):
    """Raw torchvision resnet18 state_dict -> our stage1/stage2 trees."""
    m = [("conv1", f"{flax_prefix_stage1}/conv1", "conv"),
         ("bn1", f"{flax_prefix_stage1}/bn1", "bn")]
    for i in range(2):
        m += _block_entries(f"layer1.{i}", f"{flax_prefix_stage1}/layer1_{i}")
        m += _block_entries(f"layer2.{i}", f"{flax_prefix_stage1}/layer2_{i}")
        m += _block_entries(f"layer3.{i}", f"{flax_prefix_stage2}/layer3_{i}")
    return m


def vgg19_mapping():
    """torchvision vgg19.features indices -> VGG19Features names."""
    names = [(0, "conv1_1"), (2, "conv1_2"), (5, "conv2_1"), (7, "conv2_2"),
             (10, "conv3_1"), (12, "conv3_2")]
    return [(f"features.{i}", name, "conv") for i, name in names]


# ---------------------------------------------------------------------------
# conversion machinery
# ---------------------------------------------------------------------------


def _set_path(tree: Dict, path: str, leaf_name: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_state_dict(state_dict: Mapping[str, np.ndarray], mapping,
                       strict: bool = False) -> Tuple[Dict, Dict]:
    """Apply a mapping table to a torch state_dict.

    Returns (params, batch_stats) nested dicts compatible with
    ``{'params': params, 'batch_stats': batch_stats}`` Flax variables.
    Missing optional entries (e.g. downsample of stride-1 blocks) are
    skipped; with ``strict=True`` any unconsumed weight key raises.
    """
    params: Dict = {}
    stats: Dict = {}
    consumed = set()
    for torch_name, flax_path, kind in mapping:
        if kind == "conv":
            w = state_dict.get(f"{torch_name}.weight")
            if w is None:
                continue
            _set_path(params, flax_path, "kernel",
                      np.transpose(np.asarray(w), (2, 3, 1, 0)))
            consumed.add(f"{torch_name}.weight")
            b = state_dict.get(f"{torch_name}.bias")
            if b is not None:
                _set_path(params, flax_path, "bias", np.asarray(b))
                consumed.add(f"{torch_name}.bias")
        elif kind == "conv3d":
            w = state_dict.get(f"{torch_name}.weight")
            if w is None:
                continue
            _set_path(params, flax_path, "kernel",
                      np.transpose(np.asarray(w), (2, 3, 4, 1, 0)))
            _set_path(params, flax_path, "bias",
                      np.asarray(state_dict[f"{torch_name}.bias"]))
            consumed.update({f"{torch_name}.weight", f"{torch_name}.bias"})
        elif kind == "linear":
            w = state_dict.get(f"{torch_name}.weight")
            if w is None:
                continue
            _set_path(params, flax_path, "kernel", np.asarray(w).T)
            _set_path(params, flax_path, "bias",
                      np.asarray(state_dict[f"{torch_name}.bias"]))
            consumed.update({f"{torch_name}.weight", f"{torch_name}.bias"})
        elif kind == "bn":
            w = state_dict.get(f"{torch_name}.weight")
            if w is None:
                continue
            _set_path(params, flax_path, "scale", np.asarray(w))
            _set_path(params, flax_path, "bias",
                      np.asarray(state_dict[f"{torch_name}.bias"]))
            _set_path(stats, flax_path, "mean",
                      np.asarray(state_dict[f"{torch_name}.running_mean"]))
            _set_path(stats, flax_path, "var",
                      np.asarray(state_dict[f"{torch_name}.running_var"]))
            consumed.update({f"{torch_name}.weight", f"{torch_name}.bias",
                             f"{torch_name}.running_mean",
                             f"{torch_name}.running_var"})
        else:
            raise ValueError(kind)
    if strict:
        leftover = [k for k in state_dict
                    if k not in consumed and "num_batches_tracked" not in k]
        if leftover:
            raise ValueError(f"unconsumed torch keys: {leftover[:8]} ...")
    return params, stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` (handles the {'model': sd} wrapper)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def convert_reference_checkpoint(path: str, which: str):
    """One-call conversion: which in {'spatial', 'temporal', 'smooth'}."""
    mapping = {"spatial": spatial_mapping, "temporal": temporal_mapping,
               "smooth": smooth_mapping}[which]()
    sd = load_torch_state_dict(path)
    params, stats = convert_state_dict(sd, mapping)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
