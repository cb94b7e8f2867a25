"""Boxes, grids and anchor tables.

The reference builds per-cell/per-anchor grid tables with nd loops on GPU0
(car/YOLO.py:123-155) and an anchor LTRB table for target assignment
(car/YOLO.py:209-240); IoU semantics come from yolo_modules/
yolo_gluon.py:127-168. Here the tables are built once on host with numpy
(they are tiny and static per spec) and all box math is vectorised jax.

Conventions
-----------
* image-normalised coordinates in [0, 1] unless a name says "px"
* box centre format is (y, x, h, w) — matches the reference label layout
  ``[cls, cy, cx, h, w, ...]``
* corner format is (l, t, r, b)
* flattened pyramid cells are ordered shallow-level-first, row-major,
  anchors innermost — the same order the network heads emit.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# format conversions
# --------------------------------------------------------------------------
def yxhw_to_ltrb(yxhw):
    """(..., 4) y,x,h,w -> l,t,r,b."""
    y, x, h, w = jnp.split(yxhw, 4, axis=-1)
    return jnp.concatenate([x - w / 2, y - h / 2, x + w / 2, y + h / 2], -1)


def ltrb_to_yxhw(ltrb):
    l, t, r, b = jnp.split(ltrb, 4, axis=-1)
    return jnp.concatenate([(t + b) / 2, (l + r) / 2, b - t, r - l], -1)


# --------------------------------------------------------------------------
# IoU
# --------------------------------------------------------------------------
def iou_ltrb(pred_ltrb, label_yxhw):
    """IoU of a table of ltrb boxes against one (y,x,h,w) label.

    Matches reference get_iou(mode=2) (yolo_gluon.py:144-168) including its
    use of label h*w as the target area. ``pred_ltrb``: (..., 4);
    ``label_yxhw``: (4,). Returns (...,).
    """
    l, t, r, b = (pred_ltrb[..., 0], pred_ltrb[..., 1],
                  pred_ltrb[..., 2], pred_ltrb[..., 3])
    cy, cx, h, w = label_yxhw[0], label_yxhw[1], label_yxhw[2], label_yxhw[3]
    l2, t2, r2, b2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    iw = jnp.maximum(jnp.minimum(r, r2) - jnp.maximum(l, l2), 0.0)
    ih = jnp.maximum(jnp.minimum(b, b2) - jnp.maximum(t, t2), 0.0)
    inter = iw * ih
    area_p = (r - l) * (b - t)
    area_t = h * w
    return inter / (area_p + area_t - inter)


def iou_pairwise(a_ltrb, b_ltrb):
    """Elementwise IoU of two equally-shaped (..., 4) ltrb tensors."""
    iw = jnp.maximum(
        jnp.minimum(a_ltrb[..., 2], b_ltrb[..., 2])
        - jnp.maximum(a_ltrb[..., 0], b_ltrb[..., 0]), 0.0)
    ih = jnp.maximum(
        jnp.minimum(a_ltrb[..., 3], b_ltrb[..., 3])
        - jnp.maximum(a_ltrb[..., 1], b_ltrb[..., 1]), 0.0)
    inter = iw * ih
    area_a = (a_ltrb[..., 2] - a_ltrb[..., 0]) * (a_ltrb[..., 3] - a_ltrb[..., 1])
    area_b = (b_ltrb[..., 2] - b_ltrb[..., 0]) * (b_ltrb[..., 3] - b_ltrb[..., 1])
    return inter / (area_a + area_b - inter + 1e-12)


# --------------------------------------------------------------------------
# grid / anchor tables
# --------------------------------------------------------------------------
class GridTables(NamedTuple):
    """Per-(cell, anchor) decode tables, flattened over all pyramid levels.

    Shapes are (total_cells, n_anchors, 1) except ``level`` which is
    (total_cells,) int32. ``step`` is the level stride in px; ``y``/``x``
    the cell's top-left corner in px; ``h``/``w`` the anchor prior in
    normalised units — mirroring reference car/YOLO.py:123-155.
    """
    step: jnp.ndarray
    y: jnp.ndarray
    x: jnp.ndarray
    h: jnp.ndarray
    w: jnp.ndarray
    level: jnp.ndarray


def make_grid_tables(size: Sequence[int], steps: Sequence[int],
                     all_anchors) -> GridTables:
    """Build decode tables for a pyramid.

    ``size``: (H, W) input px. ``steps``: stride per level, shallow-first.
    ``all_anchors``: (levels, n, 2) normalised (h, w) anchor priors.
    """
    H, W = int(size[0]), int(size[1])
    anchors = np.asarray(all_anchors, dtype=np.float32)
    n = anchors.shape[1]

    step_col, y_col, x_col, h_col, w_col, lvl_col = [], [], [], [], [], []
    for li, s in enumerate(steps):
        gh, gw = H // s, W // s
        yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        cells = gh * gw
        step_col.append(np.full((cells, n), float(s), np.float32))
        y_col.append(np.repeat(yy.reshape(-1, 1) * s, n, axis=1).astype(np.float32))
        x_col.append(np.repeat(xx.reshape(-1, 1) * s, n, axis=1).astype(np.float32))
        h_col.append(np.tile(anchors[li, :, 0], (cells, 1)))
        w_col.append(np.tile(anchors[li, :, 1], (cells, 1)))
        lvl_col.append(np.full((cells,), li, np.int32))

    def cat(cols):
        return jnp.asarray(np.concatenate(cols, 0)[..., None])

    return GridTables(
        step=cat(step_col), y=cat(y_col), x=cat(x_col),
        h=cat(h_col), w=cat(w_col),
        level=jnp.asarray(np.concatenate(lvl_col, 0)),
    )


def anchor_ltrb_table(size: Sequence[int], steps: Sequence[int],
                      all_anchors) -> jnp.ndarray:
    """(total_cells, n, 4) anchor boxes centred on cell centres, normalised.

    Target-assignment table: the reference's ``_get_default_ltrb``
    (car/YOLO.py:209-240). Every anchor prior is placed at each cell
    centre; assignment takes the global argmax IoU against the label box.
    """
    H, W = int(size[0]), int(size[1])
    anchors = np.asarray(all_anchors, dtype=np.float32)
    n = anchors.shape[1]
    out = []
    for li, s in enumerate(steps):
        gh, gw = H // s, W // s
        cy = (np.arange(gh) + 0.5) * s / H
        cx = (np.arange(gw) + 0.5) * s / W
        yy, xx = np.meshgrid(cy, cx, indexing="ij")
        yy = yy.reshape(-1, 1)
        xx = xx.reshape(-1, 1)
        h = anchors[li, :, 0][None, :]
        w = anchors[li, :, 1][None, :]
        l = (xx - w / 2)[..., None]
        t = (yy - h / 2)[..., None]
        r = (xx + w / 2)[..., None]
        b = (yy + h / 2)[..., None]
        out.append(np.concatenate([l, t, r, b], -1).astype(np.float32))
    return jnp.asarray(np.concatenate(out, 0).reshape(-1, n, 4))


def level_offsets(areas: Sequence[int]) -> List[int]:
    """Start index of each pyramid level in the flattened cell axis."""
    off = [0]
    for a in areas[:-1]:
        off.append(off[-1] + int(a))
    return off


# --------------------------------------------------------------------------
# head output slicing
# --------------------------------------------------------------------------
def merge_and_slice(outputs, slice_point):
    """Concat per-level head outputs over the cell axis and split channels.

    Reference semantics: car/YOLO.py:841-849 / basic_yolo.py:67-75. Accepts
    a list of (B, cells_i, n, C) arrays (shallow-first) or a single array.
    Returns a list of (B, total_cells, n, C_i) slices per slice_point.
    """
    if isinstance(outputs, (list, tuple)):
        merged = jnp.concatenate(list(outputs), axis=1)
    else:
        merged = outputs
    parts = []
    i = 0
    for pt in slice_point:
        parts.append(merged[..., i:pt])
        i = pt
    return parts
