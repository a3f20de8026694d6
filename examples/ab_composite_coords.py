"""Chip A/B: composite chunk device time across coords/gather variants.

Settles the round-4 coord_stride default now that the Pallas window
gather (ops/pallas_gather.py) removed the old dominant cost:

  s4  + pallas-gather   stride-4 coord lattice (current default) + kernel
  s1p + pallas-gather   exact coords via the Pallas coords kernel + kernel
  s1j + pallas-gather   exact coords via the jnp path + kernel
  s4  + xla-gather      the round-3 default (for the record)

plus the stride-4 vs stride-1 OUTPUT pixel delta on the same inputs.

  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/ab_composite_coords.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stabstitch2_tpu.pipeline.compositor import _composite_chunk

    chunk, H, W = 8, 360, 480
    PAD_H, PAD_W = 384, 544
    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    @jax.jit
    def chunk_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        i1 = jax.random.randint(k1, (chunk, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        i2 = jax.random.randint(k2, (chunk, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        xs, ys = jnp.linspace(0.0, W, 9), jnp.linspace(0.0, H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        m1 = base + jax.random.normal(k3, (chunk, 7, 9, 2)) * 2.0
        m2 = base + jax.random.normal(k4, (chunk, 7, 9, 2)) * 2.0 + 30.0
        return i1, i2, m1, m2

    reps = 6
    n_inputs = 1 + (2 + reps) + 2
    ci = [tuple(jax.block_until_ready(v) for v in chunk_inputs(keys[i]))
          for i in range(n_inputs)]
    offset = jnp.asarray([-10.0, -10.0], jnp.float32)

    def comp(inp, stride, pg):
        i1, i2, m1, m2 = inp
        return _composite_chunk(i1, i2, m1, m2, offset, (PAD_H, PAD_W),
                                "NORMAL", "AVERAGE",
                                grid_span=(PAD_H - 4, PAD_W - 4),
                                out_format="bgr", coord_stride=stride,
                                pallas_gather=pg)

    def drain(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def slope(fn):
        drain(fn(ci[0]))
        n_lo, n_hi = 2, 2 + reps

        def run(pool):
            t0 = time.time()
            outs = [fn(p) for p in pool]
            drain(outs[-1])
            return (time.time() - t0) * 1e3

        t_hi = run(ci[1:1 + n_hi])
        t_lo = run(ci[1 + n_hi:1 + n_hi + n_lo])
        return (t_hi - t_lo) / (n_hi - n_lo)

    variants = [
        ("s4 + pallas-gather ", lambda i: comp(i, 4, True)),
        ("s1p + pallas-gather", lambda i: comp(i, 1, True)),
        ("s4 + xla-gather    ", lambda i: comp(i, 4, False)),
        ("s1p + xla-gather   ", lambda i: comp(i, 1, False)),
    ]
    for name, fn in variants:
        t = slope(fn)
        print(f"{name}: {t:7.2f} ms/chunk", flush=True)

    # output delta stride 4 vs 1 (same inputs, kernel gather both)
    (o4, _), (o1, _) = comp(ci[0], 4, True), comp(ci[0], 1, True)
    d = np.abs(np.asarray(o4).astype(np.int16)
               - np.asarray(o1).astype(np.int16))
    print(f"stride4-vs-1 uint8 output delta: max={d.max()} "
          f"mean={d.mean():.4f} frac_nonzero={(d > 0).mean():.4f}")
    viol = bool(comp(ci[0], 4, True)[1])
    print("window-invariant violated on these inputs:", viol)


if __name__ == "__main__":
    main()
