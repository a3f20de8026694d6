"""Chip A/B: composite yuv420 variants — chained interleaved vs planar.

Round-4 found the window-gather composite's yuv420 tail costs +3.4
ms/chunk over the bgr program (chained bgr-u8 + yuv-from-u8, itself the
best of four XLA variants). Hypothesis (round 5): the cost is the
INTERLEAVED-uint8 channel extraction, not the conversion — so a planar
route (the gather kernel's combine emits per-channel planes; fusion,
quantize, and 4:2:0 all stay planar) should land near the bgr program's
cost. Variants, slope methodology (fresh device inputs, fetch one scalar
of the LAST output — block_until_ready does not sync through this
backend, CLAUDE.md):

  bgr        : production bgr program (reference point)
  chained    : bgr program + bgr_u8_to_yuv420_jit (round-4 production)
  planar1    : ONE program — planes combine + planar fusion + quantize +
               planar 4:2:0 (_composite_chunk out_format='yuv420')
  planar2    : planes_u8 program + bgr_planes_u8_to_yuv420_jit (chained
               two-program shape, planar flavor)

Parity is asserted: planar bytes must equal the chained pair exactly
(same quantize-then-convert arithmetic).

Run on the real chip (default env):
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/probe_yuv_planar.py
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

    from stabstitch2_tpu.config import StitchConfig
    from stabstitch2_tpu.ops.yuv import (bgr_planes_u8_to_yuv420_jit,
                                         bgr_u8_to_yuv420_jit)
    from stabstitch2_tpu.pipeline.compositor import _composite_chunk

    chunk = int(os.environ.get("PROBE_CHUNK", "8"))
    H, W = 360, 480
    PAD_H, PAD_W = 384, 544
    cfg = StitchConfig()
    offset = jnp.asarray([-10.0, -10.0], jnp.float32)
    reps = 5
    keys = jax.random.split(jax.random.PRNGKey(3), 64)

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

    ci = {i: jax.block_until_ready(chunk_inputs(keys[i]))
          for i in range(reps + 2)}

    def comp(i, out_format, pg=True):
        i1, i2, m1, m2 = ci[i]
        return _composite_chunk(i1, i2, m1, m2, offset, (PAD_H, PAD_W),
                                cfg.warp_mode, cfg.fusion_mode,
                                grid_span=(PAD_H - 4, PAD_W - 4),
                                out_format=out_format,
                                coord_stride=cfg.coord_stride,
                                pallas_gather=pg)

    variants = {
        "bgr": lambda i: comp(i, "bgr"),
        "chained": lambda i: (bgr_u8_to_yuv420_jit(comp(i, "bgr")[0]),),
        "planar1": lambda i: comp(i, "yuv420"),
        "planar2": lambda i: (bgr_planes_u8_to_yuv420_jit(
            *comp(i, "planes_u8")[0]),),
    }

    # parity first (bytes): planar variants vs the chained pair
    ref = jax.device_get(variants["chained"](0)[0])
    for name in ("planar1", "planar2"):
        got = jax.device_get(variants[name](0)[0])
        for a, b, pl in zip(ref, got, "YUV"):
            d = np.abs(a.astype(np.int16) - b.astype(np.int16))
            print(f"{name} {pl}: max|d|={d.max()} frac={(d > 0).mean():.2e}")

    def _drain(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[0])

    def timeit(fn):
        _drain(fn(0))

        def run(n):
            t0 = time.time()
            outs = [fn(1 + (i % reps)) for i in range(n)]
            _drain(outs[-1])
            return (time.time() - t0) * 1e3

        n_lo, n_hi = 2, 2 + reps
        return (run(n_hi) - run(n_lo)) / (n_hi - n_lo)

    for name, fn in variants.items():
        ms = timeit(fn)
        print(f"{name:8s}: {ms:7.2f} ms/chunk")


if __name__ == "__main__":
    main()
