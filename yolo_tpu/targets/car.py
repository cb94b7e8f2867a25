"""Vectorised YOLO target assignment for the car/VOR task.

Replaces the reference's per-object python loop with nd<->host syncs
(car/YOLO.py:401-480 ``_find_best``/``_loss_mask``) by a fully batched
argmax-IoU assignment under vmap — this loop was the reference's main CPU
bottleneck; here it is one fused device program.

Semantics preserved:
* best (cell, anchor) = global argmax IoU of the label box against every
  anchor prior placed at every pyramid cell centre (the LTRB table).
* ty/tx = inv_sigmoid(clip(offset_from_cell_centre * size/step + 0.5)),
  th/tw = log(label / anchor prior).
* labels with cls < 0 are padding and assign nothing.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import Spec
from yolo_tpu.ops.boxes import (GridTables, anchor_ltrb_table, iou_ltrb,
                                make_grid_tables)
from yolo_tpu.ops.math import inv_sigmoid


class CarTargets(NamedTuple):
    score: jnp.ndarray      # (B, A, n, 1)
    box_yx: jnp.ndarray     # (B, A, n, 2)
    box_hw: jnp.ndarray     # (B, A, n, 2)
    rotate: jnp.ndarray     # (B, A, n, 1)
    cls: jnp.ndarray        # (B, A, n, num_class)
    mask: jnp.ndarray       # (B, A, n, 1)


class CarTargetAssigner:
    """Precomputes the static tables once per spec; __call__ is jittable."""

    def __init__(self, spec: Spec):
        self.size = tuple(spec.size)
        self.num_class = spec.num_class
        self.ltrb = anchor_ltrb_table(spec.size, spec.steps, spec.all_anchors)
        self.grids: GridTables = make_grid_tables(
            spec.size, spec.steps, spec.all_anchors)
        self.total_cells, self.n_anchors = self.ltrb.shape[:2]

    def _assign_one(self, label):
        """label: (6 + num_class,) = [cls, cy, cx, h, w, r, class_probs...]"""
        valid = label[0] >= 0
        ious = iou_ltrb(self.ltrb, label[1:5])            # (A, n)
        flat = jnp.argmax(ious.reshape(-1))
        cell = flat // self.n_anchors
        anchor = flat % self.n_anchors

        step = self.grids.step[cell, anchor, 0]
        anc_h = self.grids.h[cell, anchor, 0]
        anc_w = self.grids.w[cell, anchor, 0]
        ctr_y = (self.ltrb[cell, anchor, 1] + self.ltrb[cell, anchor, 3]) / 2
        ctr_x = (self.ltrb[cell, anchor, 0] + self.ltrb[cell, anchor, 2]) / 2

        sig_ty = jnp.clip((label[1] - ctr_y) * self.size[0] / step + 0.5,
                          1e-4, 0.9999)
        sig_tx = jnp.clip((label[2] - ctr_x) * self.size[1] / step + 0.5,
                          1e-4, 0.9999)
        ty = inv_sigmoid(sig_ty)
        tx = inv_sigmoid(sig_tx)
        th = jnp.log(jnp.maximum(label[3] / anc_h, 1e-8))
        tw = jnp.log(jnp.maximum(label[4] / anc_w, 1e-8))

        # one-hot scatter plane for this object
        hot = (jax.nn.one_hot(cell, self.total_cells)[:, None] *
               jax.nn.one_hot(anchor, self.n_anchors)[None, :])
        hot = hot * valid.astype(hot.dtype)               # (A, n)

        box_yx = jnp.stack([ty, tx])
        box_hw = jnp.stack([th, tw])
        cls_probs = label[6:6 + self.num_class]
        return hot, box_yx, box_hw, label[5], cls_probs

    def __call__(self, labels) -> CarTargets:
        """labels: (B, num_obj, 6 + num_class).

        Arbitrary object counts are handled with the reference's overwrite
        semantics: its per-object python loop assigns targets in order, so
        when two objects claim the same (cell, anchor) the LAST one wins
        (car/YOLO.py:466-480). Here that is a one-hot gather of the
        highest-indexed valid claimant per slot — exact for any count.
        """
        per_obj = jax.vmap(jax.vmap(self._assign_one))(labels)
        hot, box_yx, box_hw, rot, cls_probs = per_obj
        # hot: (B, O, A, n); values: (B, O, ...)
        num_obj = hot.shape[1]
        priority = hot * (jnp.arange(1, num_obj + 1, dtype=hot.dtype)
                          [None, :, None, None])
        winner = jnp.argmax(priority, axis=1)             # (B, A, n)
        claimed = jnp.max(priority, axis=1) > 0           # (B, A, n)
        win_hot = jnp.moveaxis(
            jax.nn.one_hot(winner, num_obj, dtype=hot.dtype), -1, 1)
        win_hot = win_hot * claimed[:, None].astype(hot.dtype)

        def scatter(values):
            # values (B, O, K) -> (B, A, n, K), winner-takes-slot
            return jnp.einsum("boan,bok->bank", win_hot, values)

        mask = claimed[..., None].astype(hot.dtype)       # (B, A, n, 1)
        return CarTargets(
            score=mask,
            box_yx=scatter(box_yx),
            box_hw=scatter(box_hw),
            rotate=scatter(rot[..., None]),
            cls=scatter(cls_probs),
            mask=mask,
        )
