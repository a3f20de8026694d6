"""Before/after TPU microbench for the wide-gather purge (round 3).

Times the metric harness's warp formulation BEFORE (reference idiom: warp
``concat([img, ones])`` -> 6-channel gather) and AFTER (3-channel gather +
arithmetic mask, ops/interp.py:bilinear_mask), plus one smooth-trainer
step whose align term previously warped a 4-channel concat. Run on the
TPU env:

    JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache python examples/bench_gather_width.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stabstitch2_tpu.ops.mesh import mesh_points, normalize_mesh, rigid_mesh
from stabstitch2_tpu.ops.tps import tps_warp, tps_warp_with_mask

C, H, W = 8, 360, 480
REPS = 6


def timeit(fn, reps=REPS):
    jax.block_until_ready(fn(0))
    t0 = time.time()
    outs = [fn(1 + i) for i in range(reps)]
    jax.block_until_ready(outs)
    return (time.time() - t0) / reps * 1e3


def main():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    rigid = rigid_mesh(H, W)
    norm_rigid = mesh_points(normalize_mesh(rigid, H, W))

    @jax.jit
    def inputs(key):
        k1, k2 = jax.random.split(key)
        img = jax.random.uniform(k1, (C, H, W, 3), jnp.float32, 0.0, 255.0)
        mesh = rigid[None] + jax.random.normal(k2, (C, 7, 9, 2)) * 4.0
        return img, mesh_points(normalize_mesh(mesh, H, W))

    ins = {i: jax.block_until_ready(inputs(keys[i])) for i in range(REPS + 1)}
    tgt = jnp.broadcast_to(norm_rigid[None], ins[0][1].shape)

    @jax.jit
    def before(img, src):  # reference idiom: 6-channel gather
        im = jnp.concatenate([img, jnp.ones_like(img)], -1)
        return tps_warp(im, src, tgt, (H, W))

    @jax.jit
    def after(img, src):   # 3-channel gather + arithmetic mask
        return tps_warp_with_mask(img, src, tgt, (H, W))

    t_before = timeit(lambda i: before(*ins[i]))
    t_after = timeit(lambda i: after(*ins[i]))
    print(f"metric-warp chunk [{C}x{H}x{W}]:")
    print(f"  before (6ch gather)      {t_before:8.1f} ms")
    print(f"  after  (3ch + arith mask){t_after:8.1f} ms   "
          f"({t_before / max(t_after, 1e-9):.0f}x)")

    # one smooth train step (align term warp is inside the jitted step)
    import optax

    from stabstitch2_tpu.config import SmoothTrainConfig
    from stabstitch2_tpu.models import SmoothNet
    from stabstitch2_tpu.train.common import TrainState
    from stabstitch2_tpu.train.smooth import smooth_train_step

    cfg = SmoothTrainConfig()
    net = SmoothNet()
    F = cfg.frame_num + cfg.train_sqe - 1
    mesh0 = jnp.zeros((1, cfg.frame_num, 7, 9, 2))
    mv = net.init(jax.random.PRNGKey(0), mesh0, mesh0, mesh0, mesh0)
    tx = optax.adam(1e-4)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=mv["params"],
                       batch_stats=None, opt_state=tx.init(mv["params"]),
                       tx=tx)

    @jax.jit
    def batch(key):
        ks = jax.random.split(key, 6)
        mo = [jax.random.normal(k, (1, F, 7, 9, 2)) * 2.0 for k in ks[:4]]
        im = [jax.random.uniform(k, (1, F, H, W, 3), jnp.float32, 0, 255)
              for k in ks[4:]]
        return tuple(mo + im)

    bs = {i: jax.block_until_ready(batch(keys[32 + i]))
          for i in range(REPS + 1)}

    def step(i):
        _, metrics = smooth_train_step(state, bs[i], net, cfg)
        return metrics["total"]

    t_step = timeit(step)
    print(f"smooth train step (B=1, {F} frames): {t_step:8.1f} ms")


if __name__ == "__main__":
    main()
