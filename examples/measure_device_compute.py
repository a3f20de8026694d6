"""Measure TRUE per-phase device execution time (methodology of
BENCHMARKS.md "True device execution vs wall attribution").

Usage:  python examples/measure_device_compute.py   # on the TPU env

Why this exists: through a remote/tunneled chip, per-phase wall clocks
mostly measure dispatch round trips and enqueue overhead, not TPU
execution. This script times each pipeline phase by enqueuing REPS calls
with FRESH on-device random inputs (no host transfers inside the timed
region, no identical-input replay) and blocking once at the end — the
amortized per-call time is the device execution time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stabstitch2_tpu.config import StitchConfig
from stabstitch2_tpu.pipeline.compositor import _composite_chunk
from stabstitch2_tpu.pipeline.stitcher import init_stitcher

T, H, W = 48, 360, 480
CHUNK = 8
PAD_H, PAD_W = 384, 544
REPS = 8


def timeit(fn, reps=REPS):
    jax.block_until_ready(fn(0))  # warmup/compile
    t0 = time.time()
    outs = [fn(1 + i) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps * 1e3


def main():
    st = init_stitcher(rng_seed=0, chunk=CHUNK)
    keys = jax.random.split(jax.random.PRNGKey(0), 128)

    @jax.jit
    def frames(key):
        return jax.random.uniform(key, (T, H, W, 3), jnp.float32, -1.0, 1.0)

    @jax.jit
    def motions(key):
        return jax.random.normal(key, (T, 7, 9, 2), jnp.float32) * 2.0

    # materialize inputs up front so generation isn't timed
    lo = {i: jax.block_until_ready(frames(keys[i])) for i in range(2 * REPS + 2)}
    mo = {i: jax.block_until_ready(motions(keys[64 + i]))
          for i in range(4 * REPS + 4)}

    sp = timeit(lambda i: st._motion.spatial(lo[2 * i], lo[2 * i + 1]))
    tp = timeit(lambda i: st._motion.temporal(lo[2 * i]))
    sm = timeit(lambda i: st._smooth_phase(st.smooth_vars, mo[4 * i],
                                           mo[4 * i + 1], mo[4 * i + 2],
                                           mo[4 * i + 3]))

    cfg = StitchConfig()

    @jax.jit
    def chunk_inputs(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        i1 = jax.random.randint(k1, (CHUNK, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        i2 = jax.random.randint(k2, (CHUNK, H, W, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
        xs, ys = jnp.linspace(0.0, W, 9), jnp.linspace(0.0, H, 7)
        base = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
        m1 = base + jax.random.normal(k3, (CHUNK, 7, 9, 2)) * 2.0
        m2 = base + jax.random.normal(k4, (CHUNK, 7, 9, 2)) * 2.0 + 30.0
        return i1, i2, m1, m2

    ci = {i: jax.block_until_ready(chunk_inputs(keys[32 + i]))
          for i in range(REPS + 1)}
    offset = jnp.asarray([-10.0, -10.0], jnp.float32)

    def comp(i):
        i1, i2, m1, m2 = ci[i]
        return _composite_chunk(i1, i2, m1, m2, offset, (PAD_H, PAD_W),
                                cfg.warp_mode, cfg.fusion_mode,
                                grid_span=(PAD_H - 4, PAD_W - 4),
                                out_format="yuv420",
                                coord_stride=cfg.coord_stride)

    cp = timeit(comp)
    total = sp + 2 * tp + sm + cp * (T // CHUNK)
    print(f"device compute per {T} frames @ {H}x{W}:")
    print(f"  spatial (both views)        {sp:7.1f} ms")
    print(f"  temporal (per view)         {tp:7.1f} ms")
    print(f"  smooth + transport          {sm:7.1f} ms")
    print(f"  composite ({T // CHUNK} chunks)        {cp * (T // CHUNK):7.1f} ms")
    print(f"  total                       {total:7.1f} ms "
          f"= {T * 1000 / total:,.0f} fps/chip equivalent")


if __name__ == "__main__":
    main()
