"""Fused 3x3 conv + folded-BN + LeakyReLU as a Pallas TPU kernel.

The reference's compute backbone is the conv-BN-LeakyReLU block
(yolo_modules/basic_yolo.py:7-27, gluoncv `_conv2d`). Under XLA the BN
scale/bias and the LeakyReLU fuse into the convolution's epilogue
already; this kernel exists to answer — with a measured number — whether
a hand-written Pallas schedule beats XLA's conv on the shapes this
framework actually runs (tools/bench_conv_kernel.py). It is also the
template for deeper fusions (residual-add epilogues) if they win.

Schedule: grid over (batch, row-tiles, cout-tiles). Each program DMAs a
(tile_h + 2, W + 2, Cin) input slab (SAME-padded on host) from HBM into
VMEM, computes the 3x3 convolution as 9 shifted (tile_h*W, Cin) @
(Cin, tcout) MXU matmuls accumulated in an f32 VMEM scratch, applies
scale * y + bias followed by LeakyReLU in the epilogue, and writes the
(tile_h, W, tcout) output block. Weight/scale blocks are revisited
per row-tile, so Mosaic's pipeline keeps them resident.

Constraints: stride 1, SAME padding, H % tile_h == 0,
Cout % tile_cout == 0 (the wrapper picks conforming tiles).
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


def _kernel(xp_ref, w_ref, sb_ref, out_ref, slab, acc, sem, *,
            tile_h: int, width: int, cin: int, alpha: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(t * tile_h, tile_h + 2)], slab, sem)
    dma.start()
    dma.wait()

    tcout = out_ref.shape[3]
    acc[:] = jnp.zeros((tile_h * width, tcout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = slab[dy:dy + tile_h, dx:dx + width, :]
            acc[:] += jnp.dot(
                xs.reshape(tile_h * width, cin), w_ref[dy, dx],
                preferred_element_type=jnp.float32)

    y = acc[:] * sb_ref[0] + sb_ref[1]
    y = jnp.where(y > 0, y, alpha * y)                    # LeakyReLU
    out_ref[0] = y.reshape(tile_h, width, tcout).astype(out_ref.dtype)


def fused_conv3x3_bn_leaky(x, w, scale, bias, alpha: float = 0.1,
                           tile_h: Optional[int] = None,
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
    tile_h = tile_h or _pick_tile(H, 16)
    tile_cout = tile_cout or _pick_tile(Cout, 256)
    assert H % tile_h == 0 and Cout % tile_cout == 0

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sb = jnp.stack([jnp.asarray(scale, jnp.float32),
                    jnp.asarray(bias, jnp.float32)])

    kern = functools.partial(_kernel, tile_h=tile_h, width=W, cin=Cin,
                             alpha=alpha)
    grid = (B, H // tile_h, Cout // tile_cout)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # xp stays in HBM
            pl.BlockSpec((3, 3, Cin, tile_cout),
                         lambda b, t, c: (0, 0, 0, c)),
            pl.BlockSpec((2, tile_cout), lambda b, t, c: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, tile_cout),
                               lambda b, t, c: (b, t, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, W + 2, Cin), x.dtype),
            pltpu.VMEM((tile_h * W, tile_cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
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
