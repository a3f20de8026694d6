"""Chip probe: fused-motion device time vs the lax.map chunk size.

The fused motion program (stitcher._motion_fused) lax.map-chunks the
spatial/temporal nets at ``VideoStitcher.chunk`` (default 8, chosen for
the COMPOSITE's VMEM working set and upload overlap). The conv backbones
might prefer larger per-step batches on the MXU — this measures the
motion phase alone at several chunk sizes, slope methodology, fresh
device inputs per call (the relay can replay byte-identical calls).

  JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  python examples/probe_motion_chunk.py
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

    from stabstitch2_tpu.pipeline.stitcher import init_stitcher

    T = int(os.environ.get("PROBE_FRAMES", "48"))
    chunks = [int(c) for c in
              os.environ.get("PROBE_CHUNKS", "4,8,12,16,24").split(",")]
    reps = int(os.environ.get("PROBE_REPS", "6"))
    mh, mw = 360, 480
    keys = jax.random.split(jax.random.PRNGKey(0), 2 * (2 * reps + 8))

    @jax.jit
    def frames(key):
        return jax.random.uniform(key, (T, mh, mw, 3), jnp.float32,
                                  -1.0, 1.0)

    n_inputs = 2 * reps + 6
    lo = {i: jax.block_until_ready(frames(keys[i]))
          for i in range(2 * n_inputs)}

    def drain(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    for c in chunks:
        if T % c:
            print(f"chunk={c:3d}: skipped (T={T} not divisible)")
            continue
        st = init_stitcher(rng_seed=0, chunk=c)
        fn = lambda i: st._motion_fused(st.spatial_vars, st.temporal_vars,
                                        lo[2 * i], lo[2 * i + 1])
        drain(fn(0))  # compile + flush

        def run(n, base):
            t0 = time.time()
            outs = [fn(base + (i % reps)) for i in range(n)]
            drain(outs[-1])
            return (time.time() - t0) * 1e3

        n_lo, n_hi = 2, 2 + reps
        t_hi = run(n_hi, 1)
        t_lo = run(n_lo, 1 + reps)
        ms = (t_hi - t_lo) / (n_hi - n_lo)
        print(f"chunk={c:3d}: {ms:7.2f} ms / {T}-frame motion phase")


if __name__ == "__main__":
    main()
