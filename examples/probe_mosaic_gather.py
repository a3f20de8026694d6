"""Mosaic capability probe: which dynamic_gather shapes compile on this TPU?

The round-3 VMEM gather prototype failed with "Not implemented: Multiple
source vregs along gather dimension" on an (8, 544) lane gather. This maps
the supported envelope (lane gathers at <=128 lanes, sublane gathers at
<=8 sublanes, wider batch dims, dtypes) so the production kernel can be
designed around what actually lowers.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
     JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
     python examples/probe_mosaic_gather.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_kernel(src_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def _sublane_kernel(src_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def try_case(name, kernel, shape, dtype, axis):
    rows, cols = shape
    src = jnp.arange(rows * cols, dtype=dtype).reshape(rows, cols)
    hi = shape[axis]
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, hi, shape), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = np.asarray(jax.jit(fn)(src, idx))
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=axis)
        ok = np.array_equal(out, ref)
        print(f"{name:44s} COMPILES  exact={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:90]
        print(f"{name:44s} FAIL      {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for rows, cols, dt in [
        (8, 128, jnp.int32),
        (8, 128, jnp.float32),
        (16, 128, jnp.int32),
        (64, 128, jnp.int32),
        (256, 128, jnp.int32),
        (8, 256, jnp.int32),
        (8, 512, jnp.int32),
        (16, 128, jnp.bfloat16),
    ]:
        try_case(f"lane gather ({rows},{cols}) {dt.__name__}",
                 _lane_kernel, (rows, cols), dt, 1)
    for rows, cols, dt in [
        (8, 128, jnp.int32),
        (16, 128, jnp.int32),
        (32, 128, jnp.int32),
    ]:
        try_case(f"sublane gather ({rows},{cols}) {dt.__name__}",
                 _sublane_kernel, (rows, cols), dt, 0)


if __name__ == "__main__":
    main()
