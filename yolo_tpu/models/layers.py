"""Building-block layers for the detector zoo.

Semantics-parity notes (behaviour, not code, from the reference):
* ``ConvBNLeaky`` == gluoncv ``_conv2d``: 2D conv without bias, BatchNorm,
  LeakyReLU(0.1) (used throughout yolo_modules/basic_yolo.py).
* ``DarknetBlock`` == gluoncv ``DarknetBasicBlockV3``: 1x1 half-channel
  reduce, 3x3 expand, residual add.
* ``YOLODetectionBlock`` == gluoncv ``YOLODetectionBlockV3``: two
  (1x1 reduce, 3x3 expand) pairs, a 1x1 "route" and a 3x3 "tip".
* ``YOLOOutput`` == yolo_modules/basic_yolo.py:91-105: 1x1 conv to
  anchors*channels then reshape to (B, cells, anchors, channels).

All layers are NHWC with fp32 params; ``dtype`` selects the activation
compute type (bfloat16 on TPU for speed, float32 for parity tests).
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (H, W, Cin, Cout) stage shapes where the hand-written Pallas schedule
# beat XLA's conv on the real chip (reports/bench_conv_kernel.json:
# 56^2: 1.49 vs 2.76 ms, 28^2: 1.30 vs 1.68, 7^2: 1.32 vs 1.77 at
# batch 16 bf16). Inference-only: BatchNorm folds into the kernel's
# affine epilogue. Losing shapes (112^2, 14^2) stay on XLA.
FUSED_CONV_SHAPES = frozenset({
    (56, 56, 64, 128), (28, 28, 128, 256), (7, 7, 512, 1024)})


def _on_tpu() -> bool:  # separate so tests can force the fused path
    return jax.default_backend() == "tpu"


def fused_conv_enabled() -> bool:
    """Per-shape Pallas conv dispatch switch (trace-time), default OFF.

    The kernel beats XLA's conv on isolated shapes (bench_conv_kernel:
    56^2 1.49 vs 2.76 ms) but LOSES in the full model — the whole-model
    A/B on the chip measured 995 FPS fused vs 1079 FPS XLA-only
    (reports/bench_final r3 A/B): swapping pallas_call blocks into the
    conv chain breaks XLA's cross-op fusion/layout pipeline by more
    than the per-conv win. Kept as an opt-in (YOLO_TPU_FUSED_CONV=1)
    for shapes/compositions where isolation wins apply.
    """
    return os.environ.get("YOLO_TPU_FUSED_CONV", "0") == "1"


class _ConvKernelParam(nn.Module):
    """Declares nn.Conv's kernel param (same path/init) without calling
    XLA's conv — lets the fused path reuse trained checkpoints."""
    shape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          tuple(self.shape), jnp.float32)


class _BNParams(nn.Module):
    """Declares nn.BatchNorm's params/stats (same paths/inits) for the
    folded inference epilogue."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class ConvBNLeaky(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shape = (int(x.shape[1]), int(x.shape[2]), int(x.shape[3]),
                 self.filters)
        if (not train and self.kernel == 3 and self.stride == 1
                and shape in FUSED_CONV_SHAPES and fused_conv_enabled()
                and _on_tpu()):
            from yolo_tpu.pallas.conv_kernel import fused_conv3x3_bn_leaky
            w = _ConvKernelParam((3, 3, shape[2], self.filters),
                                 name="Conv_0")()
            gamma, beta, mean, var = _BNParams(self.filters,
                                               name="BatchNorm_0")()
            s = gamma * jax.lax.rsqrt(var + 1e-5)
            return fused_conv3x3_bn_leaky(
                x, w, s, beta - mean * s, alpha=0.1)
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return nn.leaky_relu(x, 0.1)


class DarknetBlock(nn.Module):
    """Residual block: 1x1 (c) then 3x3 (2c), added to the input."""
    channels: int          # the reduce width; output is 2*channels
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        x = ConvBNLeaky(self.channels, 1, dtype=self.dtype)(x, train)
        x = ConvBNLeaky(self.channels * 2, 3, dtype=self.dtype)(x, train)
        return x + res


class YOLODetectionBlock(nn.Module):
    """Returns (route, tip)."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(2):
            x = ConvBNLeaky(self.channels, 1, dtype=self.dtype)(x, train)
            x = ConvBNLeaky(self.channels * 2, 3, dtype=self.dtype)(x, train)
        route = ConvBNLeaky(self.channels, 1, dtype=self.dtype)(x, train)
        tip = ConvBNLeaky(self.channels * 2, 3, dtype=self.dtype)(route, train)
        return route, tip


class YOLOOutput(nn.Module):
    """1x1 head conv -> (B, cells, anchors, channels_per_anchor)."""
    channels_per_anchor: int
    num_anchors: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = nn.Conv(self.channels_per_anchor * self.num_anchors, (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.reshape(B, H * W, self.num_anchors, self.channels_per_anchor)


def upsample2x(x):
    """Nearest-neighbour 2x upsample (gluoncv _upsample semantics)."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


# --------------------------------------------------------------------------
# DenseNet blocks (behavioural parity with gluoncv's densenet builders used
# by LP_detection.py:59-97 and OCR/OCR.py:34-74)
# --------------------------------------------------------------------------
class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.bn_size,
                           dtype=self.dtype)(x, train)
        return x


class Transition(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetTrunk(nn.Module):
    """Stem + dense blocks + transitions + final BN/ReLU.

    Output stride = 2**(len(block_config) + 1): stem contributes 4x, each
    transition 2x.
    """
    num_init_features: int
    growth_rate: int
    block_config: Sequence[int]
    bn_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(num_layers, self.growth_rate, self.bn_size,
                           dtype=self.dtype)(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(num_features, dtype=self.dtype)(x, train)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x)
