"""DenseNet-trunk detectors: LP pose, OCR, single-scale car.

Behavioural twins of the reference nets:
* ``LPDenseNet`` — licence_plate/LP_detection.py:59-97: DenseNet trunk +
  3x3 conv(512) + 1x1 conv(7 + classes); stride-32 map over 320x512 input
  gives the 10x16 pose grid.
* ``OCRDenseNet`` — OCR/OCR.py:34-74: DenseNet trunk + (10,1) VALID conv
  squeezing height to 1 + 1x1 conv(classes+1); 24 columns at stride 16
  over a 160x384 strip; forward splits [score, class].
* ``CarDenseNet`` — car/utils.py:48-61: LPDenseNet trunk whose head emits
  anchors*channels and reshapes to (B, cells, anchors, channels).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolo_tpu.models.layers import DenseNetTrunk


class LPDenseNet(nn.Module):
    num_init_features: int
    growth_rate: int
    block_config: Sequence[int]
    classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DenseNetTrunk(self.num_init_features, self.growth_rate,
                          self.block_config, dtype=self.dtype)(x, train)
        x = nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Conv(7 + self.classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        # (B, H/2^(len(block_config)+1), W/..., 7+classes) NHWC pose map


class OCRDenseNet(nn.Module):
    num_init_features: int
    growth_rate: int
    block_config: Sequence[int]
    classes: int = 34
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DenseNetTrunk(self.num_init_features, self.growth_rate,
                          self.block_config, dtype=self.dtype)(x, train)
        # squeeze the height dimension with a VALID (H, 1) conv
        x = nn.Conv(512, (x.shape[1], 1), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.classes + 1, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        # (B, 1, columns, classes+1) -> [score, class]
        return x[..., 0:1], x[..., 1:]


class CarDenseNet(nn.Module):
    num_init_features: int
    growth_rate: int
    block_config: Sequence[int]
    num_anchors: int
    channels_per_anchor: int    # slice_point[-1]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DenseNetTrunk(self.num_init_features, self.growth_rate,
                          self.block_config, dtype=self.dtype)(x, train)
        x = nn.Conv(512, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_anchors * self.channels_per_anchor, (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        B, H, W, _ = x.shape
        return [x.reshape(B, H * W, self.num_anchors,
                          self.channels_per_anchor)]
