"""Correlation operators: local cost volume and global CCL flow.

Parity targets:
- ``cost_volume`` — Network.cost_volume (SpatialWarp/Codes/network.py:371-395,
  fast path via F.unfold): channel d = dy*(2*sr+1)+dx holds the mean-over-C
  product of x1 with x2 shifted by (dy-sr, dx-sr), followed by leaky_relu(0.1).
- ``ccl_flow`` — Network.CCL (SpatialWarp/Codes/network.py:406-461): 3x3-patch
  correlation between ALL position pairs of the two L2-normalized feature
  maps, scaled softmax (x10) over the second map's positions, and the flow is
  the expectation of the displacement. The reference materializes per-sample
  conv filters and loops over the batch; here it is one batched
  [HW, 9C] x [9C, HW] matmul — the natural MXU formulation.

All feature maps are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stabstitch2_tpu.ops.precision import HIGHEST


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cost_volume(x1: jnp.ndarray, x2: jnp.ndarray, search_range: int,
                norm: bool = True) -> jnp.ndarray:
    """Local correlation volume. x1, x2: [B, H, W, C] -> [B, H, W, (2r+1)^2]."""
    if norm:
        x1 = _l2_normalize(x1)
        x2 = _l2_normalize(x2)
    B, H, W, C = x1.shape
    r = search_range
    padded = jnp.pad(x2, ((0, 0), (r, r), (r, r), (0, 0)))
    k = 2 * r + 1
    slices = []
    for dy in range(k):
        for dx in range(k):
            shifted = jax.lax.dynamic_slice(
                padded, (0, dy, dx, 0), (B, H, W, C))
            slices.append(jnp.mean(x1 * shifted, axis=-1))
    vol = jnp.stack(slices, axis=-1)  # [B, H, W, k*k]
    return jax.nn.leaky_relu(vol, negative_slope=0.1)


def cost_volume_auto(x1: jnp.ndarray, x2: jnp.ndarray, search_range: int,
                     use_pallas: bool | None = None,
                     shard_mesh=None, interpret: bool = False) -> jnp.ndarray:
    """``cost_volume(..., norm=False)`` with backend dispatch.

    ``use_pallas=None`` auto-selects the fused Pallas kernel on TPU
    (ops/pallas_corr.py: one VMEM-resident pass instead of (2r+1)^2
    HBM-streaming fusions) and the jnp path elsewhere.

    ``shard_mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis. A bare
    pallas_call cannot auto-partition under GSPMD, so in sharded programs
    the kernel is wrapped in ``jax.shard_map`` over the batch axis — each
    device runs the kernel on its local shard and dp inference keeps the
    fused kernel instead of forfeiting it (round-4; previously
    init_stitcher pinned the jnp path whenever n_devices > 1). Falls back
    to the jnp formulation when the batch does not divide the axis.

    Measured on the real chip at the production shapes ([8,45,60,128]
    f32, slope methodology — BENCHMARKS.md round-3b): sr=5 jnp 6.5 ms
    vs Pallas 1.7 ms per chunk (3.8x; the spatial net runs TWO of
    these per chunk), sr=3 both sub-0.5 ms.
    """
    if use_pallas is None:
        from stabstitch2_tpu.ops.pallas_warp import pallas_available

        use_pallas = pallas_available()
    if use_pallas:
        # the kernel holds one whole image's blocks in VMEM (grid over B);
        # at the supported model resolutions that is ~5 MB (45x60x128
        # features), but guard anyway: fall back to jnp if a hypothetical
        # larger feature map would blow the ~16 MB VMEM with Mosaic's
        # block double-buffering
        B, H, W, C = x1.shape
        k = 2 * search_range + 1
        block_bytes = 4 * (H * W * C + (H + k - 1) * (W + k - 1) * C
                           + H * W * k * k)
        use_pallas = block_bytes < 6 * 1024 * 1024
    if use_pallas:
        from stabstitch2_tpu.ops.pallas_corr import cost_volume_fused

        def fused(a, b):
            return cost_volume_fused(a, b, search_range, interpret)

        dp = shard_mesh.shape.get("data", 1) if shard_mesh is not None else 1
        if dp > 1:
            if x1.shape[0] % dp != 0:
                # shard_map needs an exact split; odd batches take the
                # (auto-partitionable) jnp formulation instead of erroring
                return cost_volume(x1, x2, search_range, norm=False)
            from jax.sharding import PartitionSpec as P

            spec = P("data")
            # check_vma=False: pallas_call out_shapes don't carry varying-
            # across-mesh annotations, and the kernel is per-shard pure
            fused = jax.shard_map(fused, mesh=shard_mesh,
                                  in_specs=(spec, spec), out_specs=spec,
                                  check_vma=False)
        return fused(x1, x2)
    return cost_volume(x1, x2, search_range, norm=False)


def _patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded 3x3 neighborhoods: [B,H,W,C] -> [B, H*W, 9*C]."""
    B, H, W, C = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(jax.lax.dynamic_slice(padded, (0, dy, dx, 0),
                                              (B, H, W, C)))
    patches = jnp.concatenate(cols, axis=-1)  # [B, H, W, 9C]
    return patches.reshape(B, H * W, 9 * C)


def ccl_flow(feature_1: jnp.ndarray, feature_2: jnp.ndarray,
             softmax_scale: float = 10.0) -> jnp.ndarray:
    """Contextual correlation flow. [B,H,W,C] x2 -> [B,H,W,2] (w, h) flow."""
    B, H, W, C = feature_1.shape
    f1 = _l2_normalize(feature_1)
    f2 = _l2_normalize(feature_2)

    p1 = _patches_3x3(f1)  # [B, HW, 9C]
    p2 = _patches_3x3(f2)  # [B, HW, 9C]
    # match_vol[b, i, j] = <3x3 patch of f1 at i, 3x3 patch of f2 at j>
    match_vol = jnp.einsum("bik,bjk->bij", p1, p2, precision=HIGHEST,
                           preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(match_vol * softmax_scale, axis=2)  # over j

    # displacement expectation: flow(i) = sum_j attn[i,j] * (pos(j) - pos(i))
    rows = (jnp.arange(H * W, dtype=attn.dtype) // W)
    cols = (jnp.arange(H * W, dtype=attn.dtype) % W)
    pos = jnp.stack([cols, rows], axis=1)  # [HW, 2] (w, h)
    expect = jnp.einsum("bij,jc->bic", attn, pos, precision=HIGHEST)  # [B, HW, 2]
    flow = expect - pos[None]  # softmax rows sum to 1
    return flow.reshape(B, H, W, 2)
