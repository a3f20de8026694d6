"""Batched 4-point Direct Linear Transform.

Parity target: ``tensor_DLT`` (SpatialWarp/Codes/utils/torch_DLT.py:17-45).
The reference materializes A^{-1}; we use an LU solve (same math, better
conditioning, one fused XLA op on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from stabstitch2_tpu.ops.precision import HIGHEST


def solve_dlt(src_p: jnp.ndarray, dst_p: jnp.ndarray) -> jnp.ndarray:
    """Solve the 3x3 homography mapping 4 source points onto 4 targets.

    src_p, dst_p: [B, 4, 2]. Returns H: [B, 3, 3] with H[2,2] == 1.

    Row layout of the 8x8 system matches the reference exactly:
    for each correspondence i, rows 2i / 2i+1 are
    ``[x y 1 0 0 0 -x*x' -y*x']`` and ``[0 0 0 x y 1 -x*y' -y*y']``.
    """
    B = src_p.shape[0]
    dtype = src_p.dtype
    ones = jnp.ones((B, 4, 1), dtype)
    zeros = jnp.zeros((B, 4, 3), dtype)
    xy1 = jnp.concatenate([src_p, ones], axis=2)  # [B,4,3]

    row_even = jnp.concatenate([xy1, zeros], axis=2)  # [B,4,6]
    row_odd = jnp.concatenate([zeros, xy1], axis=2)   # [B,4,6]
    # interleave even/odd rows -> [B,8,6]
    M1 = jnp.stack([row_even, row_odd], axis=2).reshape(B, 8, 6)

    # M2 rows: [x'*x, x'*y] then [y'*x, y'*y] per correspondence -> [B,8,2]
    M2 = jnp.einsum("bpi,bpj->bpij", dst_p, src_p, precision=HIGHEST).reshape(B, 8, 2)

    A = jnp.concatenate([M1, -M2], axis=2)  # [B,8,8]
    b = dst_p.reshape(B, 8, 1)

    h8 = jnp.linalg.solve(A, b).reshape(B, 8)
    H = jnp.concatenate([h8, jnp.ones((B, 1), dtype)], axis=1).reshape(B, 3, 3)
    return H
