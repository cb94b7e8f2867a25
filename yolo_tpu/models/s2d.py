"""Space-to-depth stem: an EXACT, no-retraining remap of the first two
convolutions onto an MXU-friendly packed layout.

Why: the measured forward decomposition (`reports/profile_trunk.json`,
docs/MFU_CLOSEOUT.md) shows conv0 (3->16 @448²) + the stage-1
downsample eating ~25% of the joint forward at <4% of its FLOPs — a
448²x16-channel conv cannot fill the 128-lane MXU and is HBM-bound.
The classic TPU fix (MLPerf ResNet): repack frames
(B, H, W, 3) -> (B, H/2, W/2, 12) and re-express the stem convs over
the packed layout. The transform below is mathematically exact — the
packed kernels are the original kernels scattered with zeros, packed
BatchNorm is the original tiled 4x — so trained checkpoints convert
without retraining (``pack_stem_variables``).

Derivation (flax/XLA SAME padding):
* conv0: 3x3 stride 1 over H=448 pads (1, 1): raw output r reads raw
  rows r-1..r+1. Packed output block I, sub-row oi needs raw row
  2I + oi + ki - 1 = 2(I + di) + pi, so di ∈ {-1, 0, 1}: a 3x3 packed
  conv (SAME pads (1,1) over 224) with kernel
  K0[di+1, dj+1, (pi·2+pj)·3 + c, (oi·2+oj)·C0 + o] = W0[ki, kj, c, o].
* stage-1 downsample: 3x3 stride 2 over 448 pads (0, 1): output i
  reads raw rows 2i..2i+2 = 2(i + di) + pi with di ∈ {0, 1}: a 2x2
  stride-1 packed conv (SAME pads (0, 1) over 224) with
  K1[di, dj, (pi·2+pj)·C0 + c, o] = W1[ki, kj, c, o]. Its output is
  the ORIGINAL (unpacked) stage-1 feature map, so everything after is
  untouched.

Channel convention matches :func:`space_to_depth`: packed channel
index = (row_sub·2 + col_sub)·C + c.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x, block: int = 2):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C); channel = (bi*b+bj)*C + c."""
    B, H, W, C = x.shape
    b = block
    assert H % b == 0 and W % b == 0, (H, W, b)
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def pack_conv0_kernel(w0: np.ndarray) -> np.ndarray:
    """(3, 3, C_in, C0) -> (3, 3, 4*C_in, 4*C0) packed stem kernel."""
    kh, kw, cin, cout = w0.shape
    assert (kh, kw) == (3, 3), w0.shape
    k = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    w0 = np.asarray(w0, np.float32)
    for oi in range(2):
        for oj in range(2):
            for ki in range(3):
                for kj in range(3):
                    vi, vj = oi + ki - 1, oj + kj - 1
                    di, pi = vi // 2, vi % 2
                    dj, pj = vj // 2, vj % 2
                    ps = (pi * 2 + pj) * cin
                    os_ = (oi * 2 + oj) * cout
                    k[di + 1, dj + 1, ps:ps + cin, os_:os_ + cout] = \
                        w0[ki, kj]
    return k


def pack_down_kernel(w1: np.ndarray) -> np.ndarray:
    """(3, 3, C0, C1) stride-2 -> (2, 2, 4*C0, C1) stride-1 packed."""
    kh, kw, cin, cout = w1.shape
    assert (kh, kw) == (3, 3), w1.shape
    k = np.zeros((2, 2, 4 * cin, cout), np.float32)
    w1 = np.asarray(w1, np.float32)
    for ki in range(3):
        for kj in range(3):
            di, pi = ki // 2, ki % 2
            dj, pj = kj // 2, kj % 2
            ps = (pi * 2 + pj) * cin
            k[di, dj, ps:ps + cin] = w1[ki, kj]
    return k


def pack_stem_variables(variables):
    """Convert a trained YOLOv3Net/CarLPNet checkpoint to the s2d-stem
    topology (``spec.s2d_stem: true``). Only ConvBNLeaky_0 (kernel +
    BatchNorm tiled 4x) and ConvBNLeaky_1's kernel change; every other
    leaf is passed through by reference."""
    import jax
    from flax.core import unfreeze

    # tree_map rebuilds fresh containers (safe to mutate without
    # touching the caller's tree); unfreeze deep-converts FrozenDicts
    params = unfreeze(
        jax.tree_util.tree_map(lambda x: x, variables["params"]))
    stats = unfreeze(jax.tree_util.tree_map(
        lambda x: x, variables.get("batch_stats", {})))

    c0 = params["ConvBNLeaky_0"]
    c0["Conv_0"] = dict(c0["Conv_0"])
    c0["Conv_0"]["kernel"] = jnp.asarray(
        pack_conv0_kernel(np.asarray(c0["Conv_0"]["kernel"])))
    bn0 = dict(c0["BatchNorm_0"])
    for key in ("scale", "bias"):
        bn0[key] = jnp.tile(jnp.asarray(bn0[key]), 4)
    c0["BatchNorm_0"] = bn0
    params["ConvBNLeaky_0"] = c0

    c1 = dict(params["ConvBNLeaky_1"])
    c1["Conv_0"] = dict(c1["Conv_0"])
    c1["Conv_0"]["kernel"] = jnp.asarray(
        pack_down_kernel(np.asarray(c1["Conv_0"]["kernel"])))
    params["ConvBNLeaky_1"] = c1

    if stats:
        s0 = dict(stats["ConvBNLeaky_0"])
        bn0s = dict(s0["BatchNorm_0"])
        for key in ("mean", "var"):
            bn0s[key] = jnp.tile(jnp.asarray(bn0s[key]), 4)
        s0["BatchNorm_0"] = bn0s
        stats["ConvBNLeaky_0"] = s0

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
