"""Thin-plate-spline transforms (image warp + point transform).

Parity targets:
- image warp: Full_model_inference/Codes/utils/torch_tps_transform.py
  (_solve_system :168-226, _meshgrid :108-137, _transform :139-165)
- point transform: utils/torch_tps_transform_point.py:6-131.

TPU-first solver note. The reference inverts the (P+3)x(P+3) system in
float64 (torch_tps_transform.py:206) because the raw TPS matrix is
moderately ill-conditioned (cond ~ 1e4 for the 63-point lattice). f64 is
not available on TPU, but measured end-to-end the quantity that matters —
the *evaluated* sampling coordinates, produced by multiplying T with grid
rows of exactly the kind that built the system — is accurate to ~0.015 px
at 360x480 with a plain f32 LU solve (backward-stable solve => function
values accurate even when coefficients wander along near-null directions;
the reference itself evaluates the spline in f32). So: batched f32
``jnp.linalg.solve``, fully differentiable, no f64 anywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stabstitch2_tpu.ops.interp import bilinear_sample, grid_sample_align_corners
from stabstitch2_tpu.ops.precision import HIGHEST

_RBF_EPS = 1e-6  # reference: r = d2 * log(d2 + 1e-6)


def _rbf(d2: jnp.ndarray) -> jnp.ndarray:
    return d2 * jnp.log(d2 + _RBF_EPS)


def tps_params(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Solve for TPS coefficients mapping ``source`` control pts to ``target``.

    source, target: [B, P, 2] normalized points. Returns T: [B, 2, P+3]
    (affine part in columns 0..2, RBF weights after), matching the
    reference's ``_solve_system`` layout.
    """
    B, P, _ = source.shape
    dtype = source.dtype
    ones = jnp.ones((B, P, 1), dtype)
    p = jnp.concatenate([ones, source], axis=2)  # [B, P, 3]

    # Pairwise squared distances include the constant 1-column like the
    # reference (it cancels: (1-1)^2 = 0).
    diff = p[:, :, None, :] - p[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=3)  # [B, P, P]
    r = _rbf(d2)

    zeros33 = jnp.zeros((B, 3, 3), dtype)
    W_top = jnp.concatenate([p, r], axis=2)                       # [B, P, P+3]
    W_bot = jnp.concatenate([zeros33, jnp.swapaxes(p, 1, 2)], 2)  # [B, 3, P+3]
    W = jnp.concatenate([W_top, W_bot], axis=1)                   # [B, P+3, P+3]

    rhs = jnp.concatenate([target, jnp.zeros((B, 3, 2), dtype)], axis=1)
    T = jnp.linalg.solve(W, rhs)  # [B, P+3, 2]
    return jnp.swapaxes(T, 1, 2)  # [B, 2, P+3]


def tps_params_shared_source(source: jnp.ndarray,
                             targets: jnp.ndarray) -> jnp.ndarray:
    """TPS coefficients for ONE source lattice and MANY targets.

    source: [P, 2]; targets: [B, P, 2]. Returns T: [B, 2, P+3].

    Every reference call site of the point transform uses the rigid lattice
    as the source (e.g. SmoothWarp/Codes/network.py:106,115), so the system
    matrix is constant: factor once, back-substitute a batch of right-hand
    sides — O(P^3 + B*P^2) instead of B separate O(P^3) solves.
    """
    P = source.shape[0]
    dtype = source.dtype
    B = targets.shape[0]
    p = jnp.concatenate([jnp.ones((P, 1), dtype), source], axis=1)  # [P, 3]
    diff = p[:, None, :] - p[None, :, :]
    r = _rbf(jnp.sum(diff * diff, axis=2))
    W = jnp.zeros((P + 3, P + 3), dtype)
    W = W.at[:P, :3].set(p).at[:P, 3:].set(r).at[P:, 3:].set(p.T)
    rhs = jnp.concatenate([targets, jnp.zeros((B, 3, 2), dtype)], axis=1)
    # one factorization, batched solve over the stacked rhs columns
    lu, piv = jax.scipy.linalg.lu_factor(W)
    flat = jnp.moveaxis(rhs, 0, 2).reshape(P + 3, 2 * B)  # cols = (xy, batch)
    sol = jax.scipy.linalg.lu_solve((lu, piv), flat)
    return jnp.transpose(sol.reshape(P + 3, 2, B), (2, 1, 0))  # [B, 2, P+3]


def _eval_grid_rows(points_x: jnp.ndarray, points_y: jnp.ndarray,
                    source: jnp.ndarray) -> jnp.ndarray:
    """Build evaluation rows [1, x, y, r_1..r_P] for arbitrary points.

    points_x/points_y: [B, N] (or [1, N] broadcastable); source: [B, P, 2].
    Returns [B, P+3, N] (column-per-point layout like the reference grid).
    """
    px = source[:, :, 0:1]  # [B, P, 1]
    py = source[:, :, 1:2]
    d2 = (points_x[:, None, :] - px) ** 2 + (points_y[:, None, :] - py) ** 2
    r = _rbf(d2)  # [B, P, N]
    B = source.shape[0]
    ones = jnp.ones((B, 1, points_x.shape[-1]), source.dtype)
    x_rows = jnp.broadcast_to(points_x[:, None, :], ones.shape)
    y_rows = jnp.broadcast_to(points_y[:, None, :], ones.shape)
    return jnp.concatenate([ones, x_rows, y_rows, r], axis=1)  # [B, P+3, N]


def _span_step(span_n, dtype) -> jnp.ndarray:
    """Grid step 2/(span-1); accepts python ints OR traced scalars.

    Traced spans matter at dataset scale: the composite warp program is
    the most expensive compile in the framework, and keying it on the
    per-video true canvas extent (a static arg) would recompile it for
    every video — traced, one program covers every extent in a pad bucket.
    """
    if isinstance(span_n, (int, float)):
        return 2.0 / (span_n - 1) if span_n > 1 else 0.0
    s = jnp.asarray(span_n, dtype)
    return jnp.where(s > 1, 2.0 / jnp.maximum(s - 1.0, 1.0), 0.0)


def _grid_1d(n: int, span_n, dtype) -> jnp.ndarray:
    """linspace(-1, 1, span_n) extended to n points (n >= span_n).

    Lets a canvas padded to static shapes keep the TRUE canvas's
    normalization: TPS is invariant under similarity transforms only, so
    normalizing by the padded extent would change the spline slightly.
    Extra points continue past +1 with the same step and are cropped later.
    ``span_n`` may be a traced scalar (see :func:`_span_step`).
    """
    return -1.0 + _span_step(span_n, dtype) * jnp.arange(n, dtype=dtype)


def _lerp_upsample_1d(coarse: jnp.ndarray, n: int, stride: int,
                      axis: int) -> jnp.ndarray:
    """Linear interp from samples at positions 0, s, 2s, ... to 0..n-1."""
    j = jnp.arange(n)
    i0 = j // stride
    frac = (j % stride).astype(coarse.dtype) / stride
    a = jnp.take(coarse, i0, axis=axis)
    b = jnp.take(coarse, i0 + 1, axis=axis)
    shape = [1] * coarse.ndim
    shape[axis] = n
    frac = frac.reshape(shape)
    return a * (1.0 - frac) + b * frac


def tps_sample_coords(T: jnp.ndarray, source: jnp.ndarray,
                      out_size: Tuple[int, int],
                      use_pallas: Optional[bool] = None,
                      grid_span: Optional[Tuple[int, int]] = None,
                      coord_stride: int = 1,
                      shard_mesh=None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the spline over a normalized output grid.

    Returns (x_s, y_s) each [B, H*W]. ``grid_span`` gives the true canvas
    dims when ``out_size`` is a padded superset (see ``_grid_1d``). With
    ``use_pallas`` (inference-only: the kernel defines no VJP) the fused
    Pallas kernel (ops/pallas_warp.py) skips the [P+3, H*W] HBM
    intermediate; the jnp path below is the reference semantics, the
    CPU/test path, and the differentiable path.

    ``shard_mesh``: an active GSPMD mesh with a ``data`` axis. A bare
    pallas_call cannot auto-partition, so under a mesh the fused kernel is
    shard_mapped over the batch axis (ops/pallas_warp.py:
    tps_coords_fused_auto); a batch that does not divide the axis falls
    back to the jnp path.

    ``coord_stride`` > 1 evaluates the spline every s-th pixel and
    bilinearly interpolates the coordinate field to full resolution. The
    field interpolates a coarse control lattice (~60 px spacing), so the
    approximation is measured at <2e-3 px for stride 8 at 360x480
    (tests/test_geometry.py::TestCoordStride) while cutting the per-pixel
    r^2*log(r^2) transcendental count by s^2 — the dominant cost of the
    full-canvas composite warp on TPU.
    """
    if use_pallas and coord_stride > 1:
        raise ValueError(
            "use_pallas=True and coord_stride>1 conflict: the fused Pallas "
            "kernel evaluates the spline at full resolution, the stride "
            "path on a coarse lattice — pick one")
    if use_pallas is None:
        use_pallas = False
    out_h, out_w = out_size
    span_h, span_w = grid_span or out_size
    if coord_stride > 1:
        s = coord_stride
        B = source.shape[0]
        hc = (out_h - 1) // s + 2
        wc = (out_w - 1) // s + 2
        step_x = _span_step(span_w, T.dtype)
        step_y = _span_step(span_h, T.dtype)
        x1 = -1.0 + (step_x * s) * jnp.arange(wc, dtype=T.dtype)
        y1 = -1.0 + (step_y * s) * jnp.arange(hc, dtype=T.dtype)
        gx = jnp.broadcast_to(jnp.tile(x1[None, :], (hc, 1)).reshape(-1)[None],
                              (B, hc * wc))
        gy = jnp.broadcast_to(jnp.tile(y1[:, None], (1, wc)).reshape(-1)[None],
                              (B, hc * wc))
        rows = _eval_grid_rows(gx, gy, source)
        T_c = jnp.einsum("bij,bjn->bin", T, rows, precision=HIGHEST)
        field = T_c.reshape(B, 2, hc, wc)
        field = _lerp_upsample_1d(field, out_h, s, axis=2)
        field = _lerp_upsample_1d(field, out_w, s, axis=3)
        flat = field.reshape(B, 2, out_h * out_w)
        return flat[:, 0], flat[:, 1]
    if use_pallas:
        from stabstitch2_tpu.ops.pallas_warp import tps_coords_fused_auto

        out = tps_coords_fused_auto(T, source, out_size,
                                    grid_span=grid_span,
                                    shard_mesh=shard_mesh)
        if out is not None:
            return out
        # batch does not divide the mesh's data axis: jnp path below
    x1 = _grid_1d(out_w, span_w, T.dtype)
    y1 = _grid_1d(out_h, span_h, T.dtype)
    gx1 = jnp.tile(x1[None, :], (out_h, 1)).reshape(-1)
    gy1 = jnp.tile(y1[:, None], (1, out_w)).reshape(-1)
    gx = jnp.broadcast_to(gx1[None, :], (source.shape[0], out_h * out_w))
    gy = jnp.broadcast_to(gy1[None, :], (source.shape[0], out_h * out_w))
    rows = _eval_grid_rows(gx, gy, source)  # [B, P+3, HW]
    T_g = jnp.einsum("bij,bjn->bin", T, rows, precision=HIGHEST)  # [B, 2, HW]
    return T_g[:, 0], T_g[:, 1]


def tps_warp(im: jnp.ndarray, source: jnp.ndarray, target: jnp.ndarray,
             out_size: Tuple[int, int], mode: str = "NORMAL",
             T: Optional[jnp.ndarray] = None,
             use_pallas: Optional[bool] = None,
             grid_span: Optional[Tuple[int, int]] = None,
             coord_stride: int = 1, shard_mesh=None) -> jnp.ndarray:
    """TPS image warp. im: [B,H,W,C] NHWC; source/target: [B,P,2] normalized.

    ``source`` is the deformed mesh, ``target`` the rigid lattice — each
    output pixel is mapped through the source->target spline and sampled
    from ``im`` (backward warping), exactly like the reference call sites
    (e.g. SpatialWarp/Codes/network.py:145-146).

    mode='NORMAL' uses the reference's zero-outside sampler; mode='FAST'
    uses grid_sample(align_corners=True) semantics. Pass a precomputed
    ``T`` to skip the solve.
    """
    B = im.shape[0]
    out_h, out_w = out_size
    if T is None:
        T = tps_params(source, target)
    x_s, y_s = tps_sample_coords(T, source, out_size, use_pallas=use_pallas,
                                 grid_span=grid_span,
                                 coord_stride=coord_stride,
                                 shard_mesh=shard_mesh)
    if mode == "NORMAL":
        sampled = bilinear_sample(im, x_s, y_s)
    elif mode == "FAST":
        sampled = grid_sample_align_corners(im, x_s, y_s)
    else:
        raise ValueError(f"unknown warp mode {mode!r}")
    return sampled.reshape(B, out_h, out_w, im.shape[-1])


def tps_warp_with_mask(im: jnp.ndarray, source: jnp.ndarray,
                       target: jnp.ndarray, out_size: Tuple[int, int],
                       mode: str = "NORMAL",
                       T: Optional[jnp.ndarray] = None,
                       use_pallas: Optional[bool] = None,
                       grid_span: Optional[Tuple[int, int]] = None,
                       coord_stride: int = 1,
                       use_pallas_gather: bool = False,
                       use_pallas_fused: bool = False,
                       return_viol: bool = False,
                       shard_mesh=None,
                       ) -> Tuple[jnp.ndarray, ...]:
    """Like :func:`tps_warp` but also returns the coverage mask [B, oh, ow].

    The mask equals warping a concatenated ones-channel (the reference's
    idiom) but is computed arithmetically from the sample coordinates —
    every gathered channel costs real lookup time on TPU (gathers are
    per-lookup-bound, BENCHMARKS.md round-3b), so images stay 3-channel.
    uint8 NORMAL-mode inputs take the single packed-patch gather
    (interp.bilinear_sample_patch_u8); with ``use_pallas_gather`` that
    gather runs as the Mosaic window kernel (ops/pallas_gather.py, ~2.8x
    on chip). ``return_viol`` appends the kernel's window-overflow flag
    (a bool scalar; affected pixels are emitted as exact zeros) so
    callers can repair through the XLA path. ``shard_mesh``: under a
    GSPMD mesh both Pallas kernels are shard_mapped over the batch axis
    (a bare pallas_call cannot auto-partition); a batch that does not
    divide the data axis falls back to the XLA formulations."""
    from stabstitch2_tpu.ops.interp import (
        bilinear_mask,
        grid_sample_mask_align_corners,
    )

    B = im.shape[0]
    H, W = im.shape[1], im.shape[2]
    out_h, out_w = out_size
    if T is None:
        T = tps_params(source, target)
    if shard_mesh is not None and B % shard_mesh.shape.get("data", 1) != 0:
        # shard_map needs an exact batch split; otherwise the XLA path
        use_pallas_gather = False
        use_pallas_fused = False
    if (use_pallas_fused and mode == "NORMAL" and im.dtype == jnp.uint8
            and im.shape[-1] == 3 and coord_stride == 1):
        # ONE-program warp: TPS eval + window gather + combine + coverage
        # mask in a single Mosaic kernel (ops/pallas_fused.py) — no
        # coordinate field ever materializes. Same exact-or-zero + repair
        # contract as the window-gather kernel.
        from stabstitch2_tpu.ops.pallas_fused import fused_warp_planes

        pb, pg, pr, m2d, viol = fused_warp_planes(
            im, T, source, out_size, grid_span=grid_span,
            shard_mesh=shard_mesh)
        out = (jnp.stack([pb, pg, pr], axis=-1), m2d)
        return out + (viol,) if return_viol else out
    x_s, y_s = tps_sample_coords(T, source, out_size, grid_span=grid_span,
                                 use_pallas=use_pallas,
                                 coord_stride=coord_stride,
                                 shard_mesh=shard_mesh)
    viol = jnp.zeros((), jnp.bool_)
    if mode == "NORMAL":
        if im.dtype == jnp.uint8 and im.shape[-1] == 3:
            if use_pallas_gather:
                from stabstitch2_tpu.ops.pallas_gather import (
                    bilinear_sample_patch_u8_pallas)

                sampled, viol = bilinear_sample_patch_u8_pallas(
                    im, x_s, y_s, out_size, shard_mesh=shard_mesh)
            else:
                from stabstitch2_tpu.ops.interp import (
                    bilinear_sample_patch_u8)

                sampled = bilinear_sample_patch_u8(im, x_s, y_s)
        else:
            sampled = bilinear_sample(im, x_s, y_s)
        m = bilinear_mask(H, W, x_s, y_s)
    elif mode == "FAST":
        sampled = grid_sample_align_corners(im.astype(x_s.dtype), x_s, y_s)
        m = grid_sample_mask_align_corners(H, W, x_s, y_s)
    else:
        raise ValueError(f"unknown warp mode {mode!r}")
    out = (sampled.reshape(B, out_h, out_w, im.shape[-1]),
           m.reshape(B, out_h, out_w))
    return out + (viol,) if return_viol else out


def tps_transform_points(points: jnp.ndarray, source: jnp.ndarray,
                         target: jnp.ndarray,
                         T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Map a point set through the source->target spline.

    points: [B, N, 2]; source/target: [B, P, 2]. Returns [B, N, 2].
    Used for the temporal-motion transport into the stitched frame
    (SmoothWarp/Codes/network.py:106,115). When ``source`` is the rigid
    lattice (every reference call site), precompute T once with
    :func:`tps_params` and reuse it across frames.
    """
    if T is None:
        T = tps_params(source, target)
    rows = _eval_grid_rows(points[..., 0], points[..., 1], source)  # [B,P+3,N]
    T_g = jnp.einsum("bij,bjn->bin", T, rows, precision=HIGHEST)  # [B, 2, N]
    return jnp.swapaxes(T_g, 1, 2)
