"""Shared training machinery: optimizer recipe, train state, augmentation.

Optimizer parity (every reference trainer, e.g. SpatialWarp/Codes/train_ssd.py:49-51,122):
Adam(1e-4, (0.9, 0.999), eps 1e-8), ExponentialLR gamma=0.97 stepped per
epoch, global-norm gradient clip at 3.0.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from stabstitch2_tpu.config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt,
                            batch_stats=(new_batch_stats
                                         if new_batch_stats is not None
                                         else self.batch_stats))


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    """clip(3) -> Adam with staircase exponential decay per epoch."""
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.lr_decay_per_epoch,
        staircase=True)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
        optax.scale_by_learning_rate(schedule))


def create_train_state(variables, cfg: TrainConfig,
                       steps_per_epoch: int) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx)


def normalize_images(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 0..255 -> float32 [-1,1] on device (no-op for float inputs)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 127.5 - 1.0
    return img


def data_aug_pair(rng: jax.Array, img1: jnp.ndarray, img2: jnp.ndarray):
    """Per-batch brightness/color jitter (reference network.py:65-86).

    One brightness scalar and one 3-vector color scale per IMAGE TENSOR
    (shared across the batch, like the reference's torch.randn(1).uniform_),
    uniform in [0.7, 1.3], clamped to [-1, 1].
    """
    k = jax.random.split(rng, 4)
    b1 = jax.random.uniform(k[0], (), minval=0.7, maxval=1.3)
    b2 = jax.random.uniform(k[1], (), minval=0.7, maxval=1.3)
    c1 = jax.random.uniform(k[2], (3,), minval=0.7, maxval=1.3)
    c2 = jax.random.uniform(k[3], (3,), minval=0.7, maxval=1.3)
    a1 = jnp.clip(img1 * b1 * c1, -1.0, 1.0)
    a2 = jnp.clip(img2 * b2 * c2, -1.0, 1.0)
    return a1, a2


def current_lr(state: TrainState, cfg: TrainConfig,
               steps_per_epoch: int) -> float:
    epoch = int(state.step) // max(steps_per_epoch, 1)
    return cfg.learning_rate * (cfg.lr_decay_per_epoch ** epoch)
