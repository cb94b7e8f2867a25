"""Fused best-cell decode as a Pallas TPU kernel.

The XLA decode path (yolo_tpu.decode.decode_car) materialises the fully
decoded (B, cells, anchors, 5 + C) tensor in HBM before the per-image
argmax gathers one row of it. This kernel keeps everything in VMEM:
grid over the batch, one pass over the raw merged head per image —
score max + index select + single-row extraction — so HBM traffic is
exactly one read of the head and one 80-float write per image.

The box transform of the selected row stays outside (it is 4 scalars per
image, negligible); the kernel's job is killing the full-tensor
materialisation and the HBM argmax/gather round trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(in_ref, row_ref, idx_ref):
    from jax.experimental import pallas as pl

    x = in_ref[0]                                   # (R, C)
    s = x[:, 0:1]                                   # raw score column
    m = jnp.max(s)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    big = jnp.int32(s.shape[0])
    idx = jnp.min(jnp.where(s >= m, rows, big))
    # the SMEM index output is one full (B, 1) block shared across the
    # sequential grid (Mosaic rejects (1, 1) sub-blocks); each grid step
    # writes its own row
    idx_ref[pl.program_id(0), 0] = idx
    # row extraction as select + sum — Mosaic has no dynamic_slice
    # lowering, and with exactly one matching row the sum is exact.
    # where (not multiply): 0 * inf = NaN would let a single overflowed
    # value in a LOSING row corrupt the winner's column
    row_ref[0] = jnp.sum(jnp.where(rows == idx, x, jnp.zeros_like(x)),
                         axis=0, keepdims=True)


def best_cell_decode(merged, interpret=None):
    """merged: (B, R, C) raw head rows (score logit in column 0).

    Returns (rows (B, C), idx (B,) int32) — the per-image argmax-score
    row and its flat cell index. ``interpret`` defaults to True off-TPU
    so the same call site runs everywhere (Mosaic compiles TPU-only).
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, R, C = merged.shape
    from jax.experimental.pallas import tpu as pltpu

    # row output is 3-D so its last two block dims equal the array dims
    # (Mosaic requires block shapes tile-legal OR full); the scalar index
    # lives in SMEM — scalar stores to VMEM are rejected on hardware
    rows, idx = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, C), lambda b: (b, 0, 0))],
        out_specs=(pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                   pl.BlockSpec((B, 1), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 1, C), merged.dtype),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        interpret=interpret,
    )(merged)
    return rows[:, 0], idx[:, 0]


def best_cell_decode_xla(merged):
    """Reference XLA implementation (for tests and fallback)."""
    s = merged[:, :, 0]
    idx = jnp.argmax(s, axis=1).astype(jnp.int32)
    rows = jnp.take_along_axis(merged, idx[:, None, None], axis=1)[:, 0]
    return rows, idx
