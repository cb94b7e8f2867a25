"""Fused 3x3 conv + folded-BN + LeakyReLU as a Pallas TPU kernel.

The reference's compute backbone is the conv-BN-LeakyReLU block
(yolo_modules/basic_yolo.py:7-27, gluoncv `_conv2d`). Under XLA the BN
scale/bias and the LeakyReLU fuse into the convolution's epilogue
already; this kernel exists to answer — with a measured number — whether
a hand-written Pallas schedule beats XLA's conv on the shapes this
framework actually runs (tools/bench_conv_kernel.py). It is also the
template for deeper fusions (residual-add epilogues) if they win.

Schedule: grid over (batch, cout-tiles). Each program receives one
image's full SAME-padded feature map as a pipelined VMEM block (whole
last-two dims — keeps every slice tile-legal for Mosaic), computes the
3x3 convolution as 9 shifted (H*W, Cin) @ (Cin, tcout) MXU matmuls
accumulated in an f32 VMEM scratch, applies scale * y + bias and
LeakyReLU in the epilogue, and writes the (H, W, tcout) output block.
At the flagship shapes (448-input stages: 112^2x32..7^2x1024) every
block fits the ~16 MB VMEM budget.

Constraints: stride 1, SAME padding, Cout % tile_cout == 0 (the wrapper
picks a conforming tile).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _pick_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap."""
    t = min(n, cap)
    while n % t:
        t -= 1
    return t


_VMEM_BUDGET = 12 * 1024 * 1024   # scoped-vmem limit is 16 MB; leave margin


def _pick_tile_vmem(H, W, Cin, Cout, itemsize) -> Optional[int]:
    """Largest cout tile whose per-program VMEM footprint fits the budget:
    double-buffered input slab + weights + output block, plus the f32
    accumulator scratch. None if even the smallest divisor doesn't fit
    (caller falls back to XLA)."""
    cap = 256
    while cap >= 1:
        t = _pick_tile(Cout, cap)
        est = (2 * (H + 2) * (W + 2) * Cin * itemsize      # input slab x2
               + 2 * 9 * Cin * t * itemsize                # weight block x2
               + 2 * H * W * t * itemsize                  # output block x2
               + H * W * t * 4)                            # f32 scratch
        if est <= _VMEM_BUDGET:
            return t
        if t == 1:
            return None
        cap = t - 1
    return None


def _kernel(xp_ref, w_ref, sb_ref, out_ref, acc, *,
            height: int, width: int, cin: int, alpha: float):
    tcout = out_ref.shape[3]
    acc[:] = jnp.zeros((height * width, tcout), jnp.float32)
    # one full VMEM load, then VALUE-level shifted slices (register ops —
    # memref slices would have to respect the (8, 128) tiling)
    slab = xp_ref[0]                                  # (H+2, W+2, Cin)
    for dy in range(3):
        rows = jax.lax.slice_in_dim(slab, dy, dy + height, axis=0)
        for dx in range(3):
            xs = jax.lax.slice_in_dim(rows, dx, dx + width, axis=1)
            acc[:] += jnp.dot(
                xs.reshape(height * width, cin), w_ref[dy, dx],
                preferred_element_type=jnp.float32)

    y = acc[:] * sb_ref[0] + sb_ref[1]
    y = jnp.where(y > 0, y, alpha * y)                    # LeakyReLU
    out_ref[0] = y.reshape(height, width, tcout).astype(out_ref.dtype)


def fused_conv3x3_bn_leaky(x, w, scale, bias, alpha: float = 0.1,
                           tile_cout: Optional[int] = None,
                           interpret=None):
    """y = leaky_relu(conv3x3_same(x, w) * scale + bias, alpha).

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); scale/bias: (Cout,) —
    BatchNorm folded to an affine epilogue (inference form). Returns
    (B, H, W, Cout) in x.dtype. Off-TPU falls back to interpret mode.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    if tile_cout is None:
        tile_cout = _pick_tile_vmem(H, W, Cin, Cout, x.dtype.itemsize)
        if tile_cout is None:     # feature map too large for any tiling
            return conv3x3_bn_leaky_xla(x, w, scale, bias, alpha)
    assert Cout % tile_cout == 0

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb = jnp.stack([jnp.asarray(scale, jnp.float32),
                    jnp.asarray(bias, jnp.float32)])

    kern = functools.partial(_kernel, height=H, width=W, cin=Cin,
                             alpha=alpha)
    grid = (B, Cout // tile_cout)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, Cin), lambda b, c: (b, 0, 0, 0)),
            pl.BlockSpec((3, 3, Cin, tile_cout),
                         lambda b, c: (0, 0, 0, c)),
            pl.BlockSpec((2, tile_cout), lambda b, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, H, W, tile_cout),
                               lambda b, c: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H * W, tile_cout), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w.astype(x.dtype), sb)


def conv3x3_bn_leaky_xla(x, w, scale, bias, alpha: float = 0.1):
    """XLA baseline of the same fused op."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y * scale + bias
    return jnp.where(y > 0, y, alpha * y).astype(x.dtype)
