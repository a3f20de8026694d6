"""Pallas TPU kernel for the local correlation (cost) volume.

Parity target: the same math as ``ops.cost_volume.cost_volume`` (reference
``Network.cost_volume``, SpatialWarp/Codes/network.py:371-395) — for each of
the (2r+1)^2 displacements d=(dy,dx), the mean-over-C product of x1 with x2
shifted by (dy-r, dx-r), through leaky_relu(0.1).

Why a kernel: the jnp formulation emits (2r+1)^2 slice-multiply-reduce
fusions, each re-streaming both [B,H,W,C] feature maps through HBM — at the
temporal net's shapes (45x60x128, 49 shifts) that is ~49x the essential
traffic. Here each image is tiled once into VMEM and all shifts are computed
from the resident tile: one HBM read per operand, one write of the volume.

Layout: the kernel emits [B, k*k, H, W] — after the over-lanes channel
reduce, each (H, W) slice is already in natural (sublane, lane) order, so
per-displacement writes need no in-kernel relayout; the cheap NHWC
transpose for the conv head happens outside in XLA.

The kernel is inference-AND-training safe: ``cost_volume_fused`` carries a
``jax.custom_vjp`` whose backward is the VJP of the jnp reference
formulation (the backward runs only in the trainers, where the jnp path's
bandwidth was never the bottleneck). Forward numerics differ from the jnp
path only by float reassociation (pinned by
tests/test_geometry.py::TestPallasCostVolume).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cv_kernel(x1_ref, x2p_ref, out_ref, *, r: int, H: int, W: int):
    x1 = x1_ref[0]  # (H, W, C) resident in VMEM
    inv_c = 1.0 / x1.shape[-1]
    k = 2 * r + 1
    for dy in range(k):
        for dx in range(k):
            x2s = x2p_ref[0, dy:dy + H, dx:dx + W, :]
            v = jnp.sum(x1 * x2s, axis=-1) * inv_c  # (H, W)
            out_ref[0, dy * k + dx] = jnp.where(v >= 0, v, 0.1 * v)


def _cv_pallas_raw(x1: jnp.ndarray, x2: jnp.ndarray, search_range: int,
                   interpret: bool = False) -> jnp.ndarray:
    B, H, W, C = x1.shape
    r = search_range
    k = 2 * r + 1
    x2p = jnp.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))
    vol = pl.pallas_call(
        functools.partial(_cv_kernel, r=r, H=H, W=W),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2 * r, W + 2 * r, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k * k, H, W), x1.dtype),
        interpret=interpret,
    )(x1, x2p)
    return jnp.transpose(vol, (0, 2, 3, 1))  # NHWC for the conv head


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cost_volume_fused(x1: jnp.ndarray, x2: jnp.ndarray, search_range: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Pallas cost volume, differentiable. [B,H,W,C] x2 -> [B,H,W,(2r+1)^2].

    Equals ``cost_volume(x1, x2, search_range, norm=False)`` up to float
    reassociation. ``interpret=True`` runs the Mosaic interpreter (CPU
    tests).
    """
    return _cv_pallas_raw(x1, x2, search_range, interpret)


def _jnp_reference(x1, x2, search_range):
    from stabstitch2_tpu.ops.cost_volume import cost_volume

    return cost_volume(x1, x2, search_range, norm=False)


def _cv_fwd(x1, x2, search_range, interpret):
    return _cv_pallas_raw(x1, x2, search_range, interpret), (x1, x2)


def _cv_bwd(search_range, interpret, res, g):
    x1, x2 = res
    _, vjp = jax.vjp(lambda a, b: _jnp_reference(a, b, search_range), x1, x2)
    return vjp(g)


cost_volume_fused.defvjp(_cv_fwd, _cv_bwd)
