"""Vectorised licence-plate 6-DoF pose target assignment.

Semantics of the reference's ``_find_best_LP``/``_loss_mask_LP``
(licence_plate/LP_detection.py:259-313): the plate lands in the grid cell
containing its projected centre; regression targets are metres for X/Y/Z
and inv_sigmoid(r / r_max / 2 + 0.5) for the three rotations; the class
target one-hots the plate type.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_tpu.ops.math import inv_sigmoid


class LPTargets(NamedTuple):
    score: jnp.ndarray      # (B, gh, gw, 1)
    pose_xy: jnp.ndarray    # (B, gh, gw, 2)
    pose_z: jnp.ndarray     # (B, gh, gw, 1)
    pose_r: jnp.ndarray     # (B, gh, gw, 3)
    cls: jnp.ndarray        # (B, gh, gw, num_class)
    mask: jnp.ndarray       # (B, gh, gw, 1)


def assign_lp_targets(labels, grid_hw: Tuple[int, int],
                      size: Sequence[int], r_max_deg: Sequence[float],
                      num_class: int = 3) -> LPTargets:
    """labels: (B, 1, 10) = [valid, X, Y, Z, r1, r2, r3, x_px, y_px, type].

    ``x_px``/``y_px`` are the projected plate centre in input-image pixels
    (the renderer emits them; licence_plate_render/__init__.py:124-130).
    """
    gh, gw = grid_hw
    H, W = size
    step_y = H // gh            # == the head stride
    step_x = W // gw
    r_max_rad = jnp.asarray(
        [r * math.pi / 180.0 for r in r_max_deg], jnp.float32)

    def one(label):
        label = label[0]                      # single plate per image
        valid = label[0] >= 0
        hf = jnp.clip((label[8] / step_y).astype(jnp.int32), 0, gh - 1)
        wf = jnp.clip((label[7] / step_x).astype(jnp.int32), 0, gw - 1)
        hot = (jax.nn.one_hot(hf, gh)[:, None] *
               jax.nn.one_hot(wf, gw)[None, :])
        hot = hot * valid.astype(hot.dtype)   # (gh, gw)

        xy = label[1:3] / 1000.0
        z = label[3:4] / 1000.0
        r = inv_sigmoid(jnp.clip(label[4:7] / r_max_rad / 2.0 + 0.5,
                                 1e-4, 1.0 - 1e-4))
        cls_idx = jnp.clip(label[9].astype(jnp.int32), 0, num_class - 1)
        cls = jax.nn.one_hot(cls_idx, num_class)
        return hot, xy, z, r, cls

    hot, xy, z, r, cls = jax.vmap(one)(labels)
    mask = hot[..., None]

    def scatter(v):   # (B, K) -> (B, gh, gw, K)
        return hot[..., None] * v[:, None, None, :]

    return LPTargets(
        score=mask,
        pose_xy=scatter(xy),
        pose_z=scatter(z),
        pose_r=scatter(r),
        cls=scatter(cls),
        mask=mask,
    )
