"""Epoch-level training drivers for the three stages.

Parity targets: the train() functions of
SpatialWarp/TemporalWarp/SmoothWarp `train_ssd.py` / `train_tra.py` —
optimizer recipe, per-epoch LR decay (baked into the optax schedule),
tensorboard scalar set, per-epoch SSIM eval + best-checkpoint selection
(spatial, train_ssd.py:157-197), periodic checkpoints (temporal every 20,
smooth every 10), and resume-from-latest on startup.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stabstitch2_tpu.config import (
    SmoothTrainConfig,
    SpatialTrainConfig,
    TemporalTrainConfig,
)
from stabstitch2_tpu.data.datasets import (
    SmoothWindowDataset,
    SpatialPairDataset,
    TemporalPairDataset,
    batch_iterator,
)
from stabstitch2_tpu.metrics.psnr_ssim import ssim
from stabstitch2_tpu.models import SmoothNet, SpatialNet, TemporalNet
from stabstitch2_tpu.train.common import TrainState, create_train_state
from stabstitch2_tpu.train.smooth import smooth_train_step
from stabstitch2_tpu.train.spatial import (
    make_vgg_apply,
    spatial_train_outputs,
    spatial_train_step,
)
from stabstitch2_tpu.train.temporal import temporal_train_step
from stabstitch2_tpu.utils.checkpoint import TrainCheckpointer


def _parallel(step_closure, state, batch, n_devices):
    """Shard a trainer's step over a (data, model) mesh.

    Returns (jitted_step, sharded_state, mesh). Called lazily on the first
    batch so the batch template carries the real shapes/dtypes. The same
    machinery backs the driver's multichip dryrun (__graft_entry__), so
    trainers and dryrun share one code path.
    """
    from stabstitch2_tpu.parallel.train import parallelize_step

    return parallelize_step(step_closure, state, batch, n_devices=n_devices)


def _shard(mesh, batch):
    from stabstitch2_tpu.parallel.train import shard_batch

    return shard_batch(mesh, batch)


def _writer(summary_dir: Optional[str]):
    if not summary_dir:
        return None
    from tensorboardX import SummaryWriter

    return SummaryWriter(log_dir=summary_dir)


def _log(writer, metrics, step: int):
    if writer is None:
        return
    for k, v in metrics.items():
        writer.add_scalar(k, float(v), step)


def train_spatial(train_path: str, test_path: Optional[str] = None,
                  cfg: Optional[SpatialTrainConfig] = None,
                  model_dir: str = "model_spatial",
                  summary_dir: Optional[str] = None,
                  vgg_variables=None, seed: int = 0,
                  max_steps_per_epoch: Optional[int] = None,
                  model_h: int = 360, model_w: int = 480,
                  n_devices: Optional[int] = None) -> TrainState:
    cfg = cfg or SpatialTrainConfig()
    # pallas cost volume cannot auto-partition over a device mesh
    net = SpatialNet(use_pallas_corr=False if n_devices and n_devices > 1
                     else None)
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, model_h, model_w, 3))
    variables = net.init(rng, img, img, False)

    dataset = SpatialPairDataset(train_path, training=True, seed=seed,
                                 model_size=(model_h, model_w))
    if len(dataset) < cfg.batch_size:
        raise ValueError(f"dataset too small: {len(dataset)} samples "
                         f"< batch size {cfg.batch_size}")
    steps_per_epoch = min(len(dataset) // cfg.batch_size,
                          max_steps_per_epoch or 10 ** 9)
    state = create_train_state(variables, cfg, steps_per_epoch)
    ckpt = TrainCheckpointer(model_dir)
    writer = _writer(summary_dir)
    if cfg.perception_weight > 0 and vgg_variables is None:
        # the tra recipe REQUIRES the VGG perceptual term
        # (SpatialWarp/Codes/train_tra.py:112-113); silently training
        # without it would produce a different model with no warning
        raise ValueError(
            "config has perception_weight > 0 (tra recipe) but no "
            "vgg_variables were provided — pass converted VGG-19 weights "
            "(utils.torch_import.vgg19_mapping / cli train --vgg_pth), or "
            "set perception_weight=0 to train the ssd recipe")
    vgg_apply = (make_vgg_apply(vgg_variables)
                 if (vgg_variables is not None and cfg.perception_weight > 0)
                 else None)

    restored = ckpt.restore({"params": state.params,
                             "batch_stats": state.batch_stats,
                             "opt_state": state.opt_state,
                             "step": state.step})
    start_epoch = 0
    if restored:
        state = state.replace(**restored)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)

    def _raw_step(st, img1, img2, sub):
        return spatial_train_step.__wrapped__(st, img1, img2, sub, net, cfg,
                                              vgg_apply)

    par_step = mesh = None
    # best-SSIM survives restarts (JSON sidecar; the orbax payload schema
    # stays unchanged for old checkpoints) — otherwise a resumed run's
    # first epoch always "improves" on -1.0 and, with max_to_keep=3, the
    # true best checkpoint would eventually be garbage-collected
    best_file = os.path.join(model_dir, "best_ssim.json")
    best_ssim = -1.0
    if restored and os.path.exists(best_file):
        with open(best_file) as f:
            best_ssim = float(json.load(f)["best_ssim"])
    for epoch in range(start_epoch, cfg.max_epoch):
        t0 = time.time()
        it = batch_iterator(dataset, cfg.batch_size, seed=seed + epoch)
        for bi, (img1, img2) in enumerate(it):
            if bi >= steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            batch = (jnp.asarray(img1), jnp.asarray(img2), sub)
            if n_devices and n_devices > 1 and par_step is None:
                par_step, state, mesh = _parallel(_raw_step, state, batch,
                                                  n_devices)
            if par_step is not None:
                state, metrics = par_step(state, *_shard(mesh, batch))
            else:
                state, metrics = spatial_train_step(
                    state, *batch, net, cfg, vgg_apply)
            if bi % 100 == 0:
                _log(writer, metrics, int(state.step))
            # image panels every 300 iters (reference train_ssd.py:143-149)
            if writer is not None and int(state.step) % 300 == 0:
                out, _ = spatial_train_outputs(
                    net, {"params": state.params,
                          "batch_stats": state.batch_stats},
                    jnp.asarray(img1[:1]), jnp.asarray(img2[:1]), train=False)
                for key in ("output_H_ref", "output_H_tgt",
                            "output_tps_ref", "output_tps_tgt"):
                    img = np.asarray((out[key][0, ..., :3] + 1.0) / 2.0)
                    writer.add_image(key, np.clip(img, 0, 1),
                                     int(state.step), dataformats="HWC")
        print(f"[spatial] epoch {epoch + 1}/{cfg.max_epoch} "
              f"loss={float(metrics['total']):.4f} "
              f"({time.time() - t0:.1f}s)")

        # per-epoch SSIM eval on every 20th test sample + best checkpoint
        if test_path:
            test_ds = SpatialPairDataset(test_path, training=False,
                                         model_size=(model_h, model_w))
            ssims = []
            for i in range(0, len(test_ds), 20):
                a, b = test_ds[i]
                out, _ = spatial_train_outputs(
                    net, {"params": state.params,
                          "batch_stats": state.batch_stats},
                    jnp.asarray(a)[None], jnp.asarray(b)[None], train=False)
                ov = (out["output_tps_ref"][0, ..., 3]
                      * out["output_tps_tgt"][0, ..., 3])[..., None]
                ref = (out["output_tps_ref"][0, ..., :3] + 1) * 127.5
                tgt = (out["output_tps_tgt"][0, ..., :3] + 1) * 127.5
                ssims.append(float(ssim(ref * ov, tgt * ov)))
            cur = float(np.mean(ssims)) if ssims else -1.0
            if writer:
                writer.add_scalar("SSIM", cur, epoch + 1)
            if cur > best_ssim:
                best_ssim = cur
                ckpt.save(int(state.step), {
                    "params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step})
                os.makedirs(model_dir, exist_ok=True)
                with open(best_file, "w") as f:
                    json.dump({"best_ssim": best_ssim,
                               "step": int(state.step)}, f)
        else:
            ckpt.save(int(state.step), {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step})
    return state


def train_temporal(train_path: str, cfg: Optional[TemporalTrainConfig] = None,
                   model_dir: str = "model_temporal",
                   summary_dir: Optional[str] = None, seed: int = 0,
                   max_steps_per_epoch: Optional[int] = None,
                   model_h: int = 360, model_w: int = 480,
                   n_devices: Optional[int] = None) -> TrainState:
    cfg = cfg or TemporalTrainConfig()
    # pallas cost volume cannot auto-partition over a device mesh
    net = TemporalNet(use_pallas_corr=False if n_devices and n_devices > 1
                      else None)
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, model_h, model_w, 3))
    variables = net.init(rng, img, img, False)

    dataset = TemporalPairDataset(train_path, cfg.train_frame_num, seed=seed,
                                  model_size=(model_h, model_w))
    if len(dataset) < cfg.batch_size:
        raise ValueError(f"dataset too small: {len(dataset)} samples "
                         f"< batch size {cfg.batch_size}")
    steps_per_epoch = min(len(dataset) // cfg.batch_size,
                          max_steps_per_epoch or 10 ** 9)
    state = create_train_state(variables, cfg, steps_per_epoch)
    ckpt = TrainCheckpointer(model_dir)
    writer = _writer(summary_dir)
    restored = ckpt.restore({"params": state.params,
                             "batch_stats": state.batch_stats,
                             "opt_state": state.opt_state,
                             "step": state.step})
    start_epoch = 0
    if restored:
        state = state.replace(**restored)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)

    def _raw_step(st, prev, nxt, sub):
        return temporal_train_step.__wrapped__(st, prev, nxt, sub, net, cfg)

    par_step = mesh = None
    for epoch in range(start_epoch, cfg.max_epoch):
        t0 = time.time()
        it = batch_iterator(dataset, cfg.batch_size, seed=seed + epoch)
        for bi, (prev, nxt) in enumerate(it):
            if bi >= steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            batch = (jnp.asarray(prev), jnp.asarray(nxt), sub)
            if n_devices and n_devices > 1 and par_step is None:
                par_step, state, mesh = _parallel(_raw_step, state, batch,
                                                  n_devices)
            if par_step is not None:
                state, metrics = par_step(state, *_shard(mesh, batch))
            else:
                state, metrics = temporal_train_step(state, *batch, net, cfg)
            if bi % 100 == 0:
                _log(writer, metrics, int(state.step))
            # image panels every 300 iters (reference
            # TemporalWarp/Codes/train_ssd.py:149-152: img_t0 / img_t1 /
            # the TPS-warped frame t)
            if writer is not None and int(state.step) % 300 == 0:
                from stabstitch2_tpu.train.temporal import (
                    temporal_train_outputs,
                )

                out, _ = temporal_train_outputs(
                    net, {"params": state.params,
                          "batch_stats": state.batch_stats},
                    jnp.asarray(prev[:1]), jnp.asarray(nxt[:1]),
                    train=False)
                panels = {
                    "img_t0": np.asarray(prev[0], np.float32) / 255.0,
                    "img_t1": np.asarray(nxt[0], np.float32) / 255.0,
                    "warp_mesh": np.asarray(
                        (out["output_mesh"][0, ..., :3] + 1.0) / 2.0),
                }
                for key, img in panels.items():
                    writer.add_image(key, np.clip(img, 0, 1),
                                     int(state.step), dataformats="HWC")
        print(f"[temporal] epoch {epoch + 1}/{cfg.max_epoch} "
              f"loss={float(metrics['total']):.4f} "
              f"({time.time() - t0:.1f}s)")
        if (epoch + 1) % 20 == 0 or epoch + 1 == cfg.max_epoch:
            ckpt.save(int(state.step), {
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step})
    return state


def train_smooth(train_path: str, cfg: Optional[SmoothTrainConfig] = None,
                 model_dir: str = "model_smooth",
                 summary_dir: Optional[str] = None, seed: int = 0,
                 max_steps_per_epoch: Optional[int] = None,
                 n_devices: Optional[int] = None) -> TrainState:
    cfg = cfg or SmoothTrainConfig()
    net = SmoothNet()
    rng = jax.random.PRNGKey(seed)
    mesh = jnp.zeros((1, cfg.frame_num, 7, 9, 2))
    variables = net.init(rng, mesh, mesh, mesh, mesh)

    dataset = SmoothWindowDataset(
        train_path, selected_frames=cfg.frame_num + cfg.train_sqe - 1,
        train_frame_num=cfg.train_frame_num, seed=seed)
    if len(dataset) < cfg.batch_size:
        raise ValueError(f"dataset too small: {len(dataset)} windows "
                         f"< batch size {cfg.batch_size} (did you run "
                         f"export-motions first?)")
    steps_per_epoch = min(len(dataset) // cfg.batch_size,
                          max_steps_per_epoch or 10 ** 9)
    state = create_train_state(variables, cfg, steps_per_epoch)
    ckpt = TrainCheckpointer(model_dir)
    writer = _writer(summary_dir)
    restored = ckpt.restore({"params": state.params,
                             "opt_state": state.opt_state,
                             "step": state.step})
    start_epoch = 0
    if restored:
        state = state.replace(**restored)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)

    def _raw_step(st, *batch):
        return smooth_train_step.__wrapped__(st, batch, net, cfg)

    par_step = mesh = None
    for epoch in range(start_epoch, cfg.max_epoch):
        t0 = time.time()
        it = batch_iterator(dataset, cfg.batch_size, seed=seed + epoch)
        for bi, batch in enumerate(it):
            if bi >= steps_per_epoch:
                break
            batch = tuple(jnp.asarray(b) for b in batch)
            if n_devices and n_devices > 1 and par_step is None:
                par_step, state, mesh = _parallel(_raw_step, state, batch,
                                                  n_devices)
            if par_step is not None:
                state, metrics = par_step(state, *_shard(mesh, batch))
            else:
                state, metrics = smooth_train_step(state, batch, net, cfg)
            if bi % 100 == 0:
                _log(writer, metrics, int(state.step))
        print(f"[smooth] epoch {epoch + 1}/{cfg.max_epoch} "
              f"loss={float(metrics['total']):.4f} "
              f"({time.time() - t0:.1f}s)")
        if (epoch + 1) % 10 == 0 or epoch + 1 == cfg.max_epoch:
            ckpt.save(int(state.step), {
                "params": state.params, "opt_state": state.opt_state,
                "step": state.step})
    return state
