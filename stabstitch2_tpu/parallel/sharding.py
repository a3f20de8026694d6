"""Mesh + sharding-rule machinery for dp/tp training and inference.

Design (v5e-style 2D ICI):
- ``data`` axis: batch dimension of every input array (pure DP; gradients
  are reduced by XLA because params are replicated across ``data``).
- ``model`` axis: output channels of every wide conv (backbone layer2/3,
  regression-head conv stacks) and the output dimension of the wide
  regression-head Dense kernels (1536x1024, 1024x512 ...), plus the
  matching per-channel BatchNorm/bias vectors. Sharding the output
  channels makes GSPMD keep activations channel-sharded through the conv
  stacks (each chip computes its slice of the output channels; the next
  conv contracts over the sharded input channels and psums partials) —
  Megatron-style TP over the conv trunk, expressed only through placement.

Everything is rule-based over the parameter tree, so the same function
shards the Adam mu/nu trees (same structure) for free.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a (data, model) mesh; tp defaults to 2 when it divides n."""
    devices = np.asarray(jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(devices.reshape(dp, tp), axis_names)


def _leaf_spec(path: str, leaf) -> P:
    """Sharding rule for one parameter/optimizer leaf."""
    shape = getattr(leaf, "shape", ())
    if "kernel" in path:
        if len(shape) == 2 and shape[1] >= 128 and "fc" in path:
            return P(None, "model")   # TP: split Dense output columns
        if len(shape) == 4 and shape[3] >= 128:
            return P(None, None, None, "model")  # TP: conv output channels
    # per-channel vectors riding a sharded channel dim: conv/Dense biases,
    # BatchNorm scale/bias and running mean/var (same rule shards the Adam
    # mu/nu mirrors because the tree structure is identical)
    if (len(shape) == 1 and shape[0] >= 128
            and any(t in path for t in ("bias", "scale", "mean", "var"))):
        return P("model")
    return P()                     # replicated


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree matching ``tree`` (params / TrainState / opt)."""
    def to_sharding(path, leaf):
        pathstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
        spec = _leaf_spec(pathstr, leaf)
        # guard: only shard dims divisible by the axis size
        axes = [a for a in spec if a is not None]
        if axes:
            shape = getattr(leaf, "shape", ())
            for dim, name in enumerate(spec):
                if name is not None and shape[dim] % mesh.shape[name] != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def batch_sharding(mesh: Mesh, tree: Any) -> Any:
    """Shard every array's leading (batch) dim over the ``data`` axis."""
    dp = mesh.shape["data"]

    def to_sharding(leaf):
        ndim = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())
        # batch arrays only: rank >= 2 with a data-divisible leading dim
        # (PRNG keys, scalars, odd remainders stay replicated)
        if ndim >= 2 and shape[0] % dp == 0:
            return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(to_sharding, tree)


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)
