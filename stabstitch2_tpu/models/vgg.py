"""VGG-19 feature trunk for the perceptual loss (tra preset).

Parity target: ``get_vgg19_FeatureMap`` (SpatialWarp/Codes/loss.py:9-26) —
torchvision vgg19.features executed up to index 13 (relu3_2), input is
0..255 pixels minus the fixed channel mean [123.68, 116.779, 103.939], no
scaling. Only the layers up to relu3_2 are instantiated (conv1_1..conv3_2);
the reference collects taps at indices 6/13/24 but uses only the last one
at layer_index=13 (loss.py:34,41).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

VGG_MEAN = (123.6800, 116.7790, 103.9390)


class VGG19Features(nn.Module):
    """0..255 NHWC input -> relu3_2 feature map [B, H/4, W/4, 256]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_255):
        x = x_255 - jnp.asarray(VGG_MEAN, x_255.dtype)
        x = x.astype(self.dtype)
        cfg = [(64, "conv1_1"), (64, "conv1_2"), ("pool", None),
               (128, "conv2_1"), (128, "conv2_2"), ("pool", None),
               (256, "conv3_1"), (256, "conv3_2")]
        for feat, name in cfg:
            if feat == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(feat, (3, 3), padding=1, dtype=self.dtype,
                            name=name)(x)
                x = nn.relu(x)
        return x.astype(jnp.float32)
