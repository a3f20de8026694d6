"""Chip A/B: v3 fused composite kernel vs v2 window-gather vs XLA.

Round-5 verdict item 1. Same-process slope timing (fresh device inputs,
fetch one scalar of the LAST output; block_until_ready does not sync
through this backend — CLAUDE.md) at the production two-view shape:
8-frame chunk, 360x480 inputs, 384x544 padded canvas.

Variants (all through _composite_chunk, bgr + chained-yuv forms):
  xla        : packed-patch XLA gather (CPU/GSPMD path)
  v2         : Pallas coords kernel + window-gather kernel + XLA combine
  v3         : ONE fused Mosaic program (ops/pallas_fused.py)

Parity asserted first: v3 vs v2 uint8 output (expect <= 1 LSB on a tiny
fraction; both exact-or-zero + repair).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
     JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
     python examples/ab_fused_composite.py
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
    from stabstitch2_tpu.ops.yuv import bgr_u8_to_yuv420_jit
    from stabstitch2_tpu.pipeline.compositor import _composite_chunk

    chunk = int(os.environ.get("AB_CHUNK", "8"))
    H = int(os.environ.get("AB_H", "360"))
    W = int(os.environ.get("AB_W", "480"))
    PAD_H = int(os.environ.get("AB_PH", "384"))
    PAD_W = int(os.environ.get("AB_PW", "544"))
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
        m1 = base + jax.random.normal(k3, (chunk, 7, 9, 2)) * (2.0 * H / 360)
        m2 = base + jax.random.normal(k4, (chunk, 7, 9, 2)) * (2.0 * H / 360) \
            + 30.0 * H / 360
        return i1, i2, m1, m2

    ci = {i: jax.block_until_ready(chunk_inputs(keys[i]))
          for i in range(reps + 2)}

    def comp(i, out_format="bgr", pg=False, pf=False):
        i1, i2, m1, m2 = ci[i]
        return _composite_chunk(i1, i2, m1, m2, offset, (PAD_H, PAD_W),
                                cfg.warp_mode, cfg.fusion_mode,
                                grid_span=(PAD_H - 4, PAD_W - 4),
                                out_format=out_format,
                                coord_stride=cfg.coord_stride,
                                pallas_gather=pg, pallas_fused=pf)

    # ---- parity: v3 vs v2 vs xla (uint8 bgr) ----
    o_xla = np.asarray(comp(0)[0]).astype(np.int16)
    o_v2, viol2 = comp(0, pg=True)
    o_v3, viol3 = comp(0, pf=True)
    for name, o, v in (("v2", o_v2, viol2), ("v3", o_v3, viol3)):
        d = np.abs(np.asarray(o).astype(np.int16) - o_xla)
        print(f"{name} vs xla: max|d|={d.max()} frac={(d > 0).mean():.2e} "
              f"viol={bool(v)}")

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

    variants = {
        "xla_bgr": lambda i: comp(i),
        "v2_bgr": lambda i: comp(i, pg=True),
        "v3_bgr": lambda i: comp(i, pf=True),
        "v2_yuvchain": lambda i: (bgr_u8_to_yuv420_jit(
            comp(i, pg=True)[0]),),
        "v3_yuvchain": lambda i: (bgr_u8_to_yuv420_jit(
            comp(i, pf=True)[0]),),
        "v3_yuv1prog": lambda i: comp(i, out_format="yuv420", pf=True),
    }
    for name, fn in variants.items():
        print(f"{name:12s}: {timeit(fn):7.2f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
