"""Mosaic capability probe: fori_loop + dynamic-start sublane slices.

The fused composite kernel (round 5) wants a DYNAMIC tile loop
(`lax.fori_loop(0, ntl, ...)`) whose body reads window rows at a
dynamic sublane offset (`win_ref[pl.ds(k*8+r, 1), :]`) with vector
carries — code size then stays independent of the window height (the
1080p window needs ~48 tiles, which would unroll to ~12k Mosaic ops
under the v2 static-`pl.when` pattern). This probes:

  1. dynamic-start sublane load from a VMEM ref inside fori_loop
  2. (8, 128) f32/int32 vector carries through fori_loop
  3. a take_along_axis lane gather INSIDE the dynamic loop body

Run: python examples/probe_dynslice.py   (real chip, default env)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WIN_H, WIN_W = 64, 256

    def kernel(ntl_ref, win_ref, idx_ref, o_ref):
        ntl = ntl_ref[0]
        idx = idx_ref[:]                      # (8, 128) int32 in [0, 128)

        def body(k, acc):
            out = jnp.zeros((8, 128), jnp.int32)
            for rr in range(8):
                row = win_ref[pl.ds(k * 8 + rr, 1), :128]   # (1, 128)
                src = jnp.broadcast_to(row, (8, 128))
                g = jnp.take_along_axis(src, idx, axis=1)
                out = out + jnp.where((idx % 8) == rr, g, 0)
            return acc + out

        o_ref[:] = jax.lax.fori_loop(0, ntl, body, jnp.zeros((8, 128),
                                                             jnp.int32))

    win = jnp.arange(WIN_H * WIN_W, dtype=jnp.int32).reshape(WIN_H, WIN_W)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (8, 128)), jnp.int32)
    ntl = jnp.asarray([3], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((WIN_H, WIN_W), lambda i, n: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda i, n: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(ntl, win, idx)
        out = np.asarray(out)
        winn = np.asarray(win)
        idxn = np.asarray(idx)
        want = np.zeros((8, 128), np.int64)
        for k in range(int(ntl[0])):
            for rr in range(8):
                row = winn[k * 8 + rr, :128]
                g = row[idxn]
                want += np.where((idxn % 8) == rr, g, 0)
        ok = (out == want).all()
        print("dynamic-slice fori_loop:", "OK" if ok else "MISMATCH")
        if not ok:
            print("maxdiff", np.abs(out - want).max())
    except Exception as e:
        print(f"dynamic-slice fori_loop: FAILED "
              f"({type(e).__name__}: {str(e).splitlines()[0][:120]})")


if __name__ == "__main__":
    main()
