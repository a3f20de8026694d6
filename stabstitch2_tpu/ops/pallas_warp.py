"""Pallas TPU kernels for the warp hot path.

``tps_coords_fused`` evaluates TPS sampling coordinates
    x_s(p) = a0 + a1*x + a2*y + sum_k w_k * r(|p - s_k|^2)
for every output pixel WITHOUT materializing the [P+3, H*W] radial-basis
tensor that the stock jnp path (ops/tps.py:_eval_grid_rows) streams through
HBM — at a 512x640 canvas that intermediate is ~86 MB per image vs ~2.5 MB
of actual inputs+outputs. The kernel keeps an (8, W) row-tile of the output
grid in VMEM and accumulates the P=63 control-point contributions in
registers: pure VPU work (mul/add/log), ~P*6 flops/pixel, one HBM write.

Used by ops.tps.tps_sample_coords on TPU backends; the jnp path remains the
reference semantics (and the CPU/test path — the kernel is validated against
it in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RBF_EPS = 1e-6
_ROWS = 8  # sublane tile height


def _kernel(t_ref, src_ref, gx_ref, gy_ref, xs_ref, ys_ref, *, num_points):
    gx = gx_ref[:]  # (ROWS, W)
    gy = gy_ref[:]
    acc_x = t_ref[0, 0, 0] + t_ref[0, 0, 1] * gx + t_ref[0, 0, 2] * gy
    acc_y = t_ref[0, 1, 0] + t_ref[0, 1, 1] * gx + t_ref[0, 1, 2] * gy
    for p in range(num_points):  # static unroll over control points
        dx = gx - src_ref[0, p, 0]
        dy = gy - src_ref[0, p, 1]
        d2 = dx * dx + dy * dy
        r = d2 * jnp.log(d2 + _RBF_EPS)
        acc_x = acc_x + t_ref[0, 0, 3 + p] * r
        acc_y = acc_y + t_ref[0, 1, 3 + p] * r
    xs_ref[0] = acc_x
    ys_ref[0] = acc_y


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def tps_coords_fused(T: jnp.ndarray, source: jnp.ndarray,
                     out_size: Tuple[int, int], interpret: bool = False,
                     grid_span=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T: [B, 2, P+3]; source: [B, P, 2] -> (x_s, y_s) each [B, H*W].

    Matches ops.tps.tps_sample_coords (same normalized grid; ``grid_span``
    extends a true-canvas grid across a padded out_size). ``grid_span``
    entries may be python ints OR traced scalars — traced keeps ONE
    compiled program per padded out_size across every true canvas extent
    (the grid rows are built with jnp arithmetic outside the kernel, so
    the kernel itself never sees the span).
    """
    from stabstitch2_tpu.ops.tps import _span_step

    B, _, pn3 = T.shape
    P = pn3 - 3
    out_h, out_w = out_size
    span_h, span_w = grid_span if grid_span is not None else out_size
    pad_h = -(-out_h // _ROWS) * _ROWS

    def grid_1d(n, span_n):
        return -1.0 + _span_step(span_n, T.dtype) * jnp.arange(n, dtype=T.dtype)

    gx_row = jnp.tile(grid_1d(out_w, span_w)[None, :], (pad_h, 1))
    gy_col = grid_1d(out_h, span_h)
    gy_col = jnp.pad(gy_col, (0, pad_h - out_h), constant_values=1.0)
    gy_row = jnp.tile(gy_col[:, None], (1, out_w))

    grid = (B, pad_h // _ROWS)
    xs, ys = pl.pallas_call(
        functools.partial(_kernel, num_points=P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, pn3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, out_w), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, out_w), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _ROWS, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, out_w), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, pad_h, out_w), T.dtype),
            jax.ShapeDtypeStruct((B, pad_h, out_w), T.dtype),
        ],
        interpret=interpret,
    )(T, source, gx_row, gy_row)
    xs = xs[:, :out_h].reshape(B, out_h * out_w)
    ys = ys[:, :out_h].reshape(B, out_h * out_w)
    return xs, ys


def tps_coords_fused_auto(T: jnp.ndarray, source: jnp.ndarray,
                          out_size: Tuple[int, int], grid_span=None,
                          shard_mesh=None,
                          interpret: bool | None = None):
    """Mesh-aware dispatch for :func:`tps_coords_fused`.

    A bare ``pallas_call`` cannot auto-partition under GSPMD, so when a
    ``jax.sharding.Mesh`` with a ``data`` axis is active the kernel is
    wrapped in ``jax.shard_map`` over the batch axis (the same pattern as
    ``ops.cost_volume.cost_volume_auto``) — every device runs the kernel
    on its local batch shard and the grid/span scalars are replicated.
    Returns None when the batch does not divide the data axis: the caller
    falls back to the (auto-partitionable) jnp path.

    ``interpret=None`` auto-selects the Mosaic interpreter on CPU (same
    contract as ops/pallas_gather.bilinear_sample_patch_u8_pallas) so
    mesh tests can FORCE the kernel on under the virtual-device mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dp = shard_mesh.shape.get("data", 1) if shard_mesh is not None else 1
    if dp <= 1:
        return tps_coords_fused(T, source, out_size, interpret=interpret,
                                grid_span=grid_span)
    if T.shape[0] % dp != 0:
        return None
    from jax.sharding import PartitionSpec as P

    span = grid_span if grid_span is not None else out_size
    sh = jnp.asarray(span[0], T.dtype)
    sw = jnp.asarray(span[1], T.dtype)

    def fn(Ts, srcs, a, b):
        return tps_coords_fused(Ts, srcs, out_size, interpret=interpret,
                                grid_span=(a, b))

    # check_vma=False: pallas_call out_shapes don't carry varying-
    # across-mesh annotations, and the kernel is per-shard pure
    fn = jax.shard_map(fn, mesh=shard_mesh,
                       in_specs=(P("data"), P("data"), P(), P()),
                       out_specs=(P("data"), P("data")), check_vma=False)
    return fn(T, source, sh, sw)


def pallas_available() -> bool:
    """True when the default backend can run the Mosaic kernel natively."""
    return jax.default_backend() not in ("cpu",)
