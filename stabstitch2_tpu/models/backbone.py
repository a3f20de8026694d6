"""ResNet-18 feature extractor, truncated like the reference.

Parity target: ``get_res18_FeatureMap`` (SpatialWarp/Codes/network.py:162-176)
— stage1 = conv1/bn/relu/maxpool + layer1 + layer2 (stride H/8, 128ch),
stage2 = layer3 (stride H/16, 256ch). Parameter tree is 1:1 with
torchvision's resnet18 so ImageNet or reference checkpoints convert
directly (utils/torch_import.py).

NHWC layout; params live in f32, compute dtype is configurable (bf16 for
TPU conv throughput).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs + BN, identity/1x1 shortcut."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage1(nn.Module):
    """conv1 -> bn -> relu -> maxpool -> layer1 -> layer2 (H/8, 128ch)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):  # layer1: 64ch, stride 1
            x = BasicBlock(64, dtype=self.dtype, name=f"layer1_{i}")(x, train)
        for i in range(2):  # layer2: 128ch, first block stride 2
            x = BasicBlock(128, stride=2 if i == 0 else 1, dtype=self.dtype,
                           name=f"layer2_{i}")(x, train)
        return x


class ResNetStage2(nn.Module):
    """layer3 only (H/16, 256ch)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = BasicBlock(256, stride=2 if i == 0 else 1, dtype=self.dtype,
                           name=f"layer3_{i}")(x, train)
        return x


class ConvHead(nn.Module):
    """A stack of (conv3x3 -> relu) x2 + maxpool2 stages.

    Mirrors the reference's regression-head convolutions
    (e.g. SpatialWarp/Codes/network.py:219-247): bias-free convs,
    kaiming-normal init, 2x2 max pooling after each pair.
    """

    stage_features: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for si, feat in enumerate(self.stage_features):
            for ci in range(2):
                x = nn.Conv(feat, (3, 3), padding=1, use_bias=False,
                            kernel_init=nn.initializers.he_normal(),
                            dtype=self.dtype, name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class MLPHead(nn.Module):
    """Dense stack with ReLU between layers (no activation at the end).

    Input is flattened in C,H,W order (matching the reference's
    ``temp.view(bs, -1)`` on NCHW tensors) so converted torch Linear
    weights apply verbatim.
    """

    features: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # NHWC -> NCHW flatten order for torch-compatible Dense weights
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = x.astype(self.dtype)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, name=f"fc{i}")(x)
            if i + 1 < len(self.features):
                x = nn.relu(x)
        return x
