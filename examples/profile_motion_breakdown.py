"""Break the motion phases' device time into backbone / correlation / head.

Methodology of examples/measure_device_compute.py (fresh on-device inputs,
enqueue REPS calls, block once): run on the TPU env, FIRST in a fresh
process (relay throttling inflates enqueue timings after bulk downloads).

Output: one JSON dict of per-call device ms for each sub-phase, for the
standard 48-frame 360x480 two-view video (chunk=8 programs, like the
production phase drivers in pipeline/motion.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def main():
    import jax
    import jax.numpy as jnp

    from stabstitch2_tpu.models.temporal import TemporalNet
    from stabstitch2_tpu.ops.cost_volume import cost_volume
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher

    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    frames = int(os.environ.get("BENCH_FRAMES", "48"))
    n_chunks = -(-frames // chunk)
    H, W = 360, 480
    h8, w8 = H // 8, W // 8
    st = init_stitcher(rng_seed=0, chunk=chunk)
    me = st._motion

    keys = jax.random.split(jax.random.PRNGKey(0), 256)

    @jax.jit
    def _imgs(key):
        return jax.random.uniform(key, (chunk, H, W, 3), jnp.float32,
                                  -1.0, 1.0)

    @jax.jit
    def _feats(key):
        return jax.random.normal(key, (chunk, h8, w8, 128), jnp.float32)

    imgs = {i: jax.block_until_ready(_imgs(keys[i])) for i in range(32)}
    feats = {i: jax.block_until_ready(_feats(keys[64 + i])) for i in range(32)}

    reps = int(os.environ.get("BENCH_REPS", "8"))

    def timeit(fn):
        # fn(i) must stay in-bounds for i in [0, 15] (pair consumers use
        # 2*i, 2*i+1 -> max index 31)
        jax.block_until_ready(fn(0))  # warmup/compile
        t0 = time.time()
        outs = [fn(1 + (i % 14)) for i in range(reps)]
        jax.block_until_ready(outs)
        return round((time.time() - t0) / reps * 1e3, 3)

    tn = TemporalNet()

    @jax.jit
    def corr_only(f1, f2):
        return cost_volume(f1, f2, search_range=3, norm=False)

    @jax.jit
    def corr5_only(f1, f2):
        return cost_volume(f1, f2, search_range=5, norm=False)

    from stabstitch2_tpu.ops.pallas_corr import cost_volume_fused

    @jax.jit
    def corr_pallas(f1, f2):
        return cost_volume_fused(f1, f2, 3)

    @jax.jit
    def corr5_pallas(f1, f2):
        return cost_volume_fused(f1, f2, 5)

    @jax.jit
    def head_only(variables, corr):
        conv = tn.apply(variables, corr,
                        method=lambda m, c: m.regress_conv(c))
        return tn.apply(variables, conv,
                        method=lambda m, c: m.regress_fc(c))

    corr0 = jax.block_until_ready(
        corr_only(feats[0], feats[1]))
    res = {}
    # per-chunk (x n_chunks = per-video phase share)
    res["features_chunk_ms"] = timeit(
        lambda i: me._features(me.temporal_vars, imgs[i]))
    res["pair_motion_chunk_ms"] = timeit(
        lambda i: me._pair_motion(me.temporal_vars, feats[2 * i],
                                  feats[2 * i + 1]))
    res["cost_volume_sr3_chunk_ms"] = timeit(
        lambda i: corr_only(feats[2 * i], feats[2 * i + 1]))
    res["cost_volume_sr5_chunk_ms"] = timeit(
        lambda i: corr5_only(feats[2 * i], feats[2 * i + 1]))
    if jax.default_backend() != "cpu":
        res["cost_volume_sr3_pallas_ms"] = timeit(
            lambda i: corr_pallas(feats[2 * i], feats[2 * i + 1]))
        res["cost_volume_sr5_pallas_ms"] = timeit(
            lambda i: corr5_pallas(feats[2 * i], feats[2 * i + 1]))
    res["head_chunk_ms"] = timeit(
        lambda i: head_only(me.temporal_vars, corr0))
    res["spatial_chunk_ms"] = timeit(
        lambda i: me._spatial(me.spatial_vars, imgs[2 * i], imgs[2 * i + 1]))
    res["n_chunks"] = n_chunks
    res["temporal_view_ms"] = round(
        n_chunks * (res["features_chunk_ms"] + res["pair_motion_chunk_ms"]),
        2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
