"""Break the motion phases' device time into backbone / correlation / head.

SLOPE methodology (see bench.measure_device_compute): through the remote
axon backend ``block_until_ready`` does NOT synchronize (launches stream;
only data fetches wait), so enqueue-then-block timings measure Python
enqueue rate. Each measurement here enqueues n_lo then n_hi calls with
fresh on-device inputs, forces a data dependency by fetching one scalar of
the last output, and reports the slope — per-call device time with the
drain round trip cancelled.

Run on the TPU env, FIRST in a fresh process (relay throttling inflates
everything after bulk downloads).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from stabstitch2_tpu.models.temporal import TemporalNet
    from stabstitch2_tpu.ops.cost_volume import cost_volume
    from stabstitch2_tpu.ops.pallas_corr import cost_volume_fused
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

    def drain(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def timeit(fn, n_lo=2, n_hi=8):
        # fn(i) must stay in-bounds for i in [0, 15] (pair consumers use
        # 2*i, 2*i+1 -> max index 31)
        drain(fn(0))  # warmup/compile + flush

        def run(n):
            t0 = time.time()
            outs = [fn(1 + (i % 14)) for i in range(n)]
            drain(outs[-1])
            return (time.time() - t0) * 1e3

        return round((run(n_hi) - run(n_lo)) / (n_hi - n_lo), 3)

    tn = TemporalNet()

    @jax.jit
    def corr_only(f1, f2):
        return cost_volume(f1, f2, search_range=3, norm=False)

    @jax.jit
    def corr5_only(f1, f2):
        return cost_volume(f1, f2, search_range=5, norm=False)

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
    res["motion_fused_video_ms"] = timeit(
        lambda i: st._motion_fused(
            st.spatial_vars, st.temporal_vars,
            jnp.concatenate([imgs[2 * i]] * n_chunks, 0),
            jnp.concatenate([imgs[2 * i + 1]] * n_chunks, 0)))
    res["n_chunks"] = n_chunks
    res["temporal_view_ms"] = round(
        n_chunks * (res["features_chunk_ms"] + res["pair_motion_chunk_ms"]),
        2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
