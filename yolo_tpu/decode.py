"""On-device decoding of network heads to detections.

Replaces the host-side numpy/nd decode paths of the reference —
car predict (car/YOLO.py:552-597), LP predict (LP_detection.py:147-162,
car_and_LP/YOLO.py:133-169), OCR peak finding (OCR/OCR.py:180-201), and
the RadarProb class-distribution -> angle decode (yolo_modules/
yolo_cv.py:85-94) — with jittable, batched jax. Parity note: like the
reference, the default box decode takes the single global argmax per image
(no NMS); an optional top-k greedy NMS is provided as an extension.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.boxes import (GridTables, ltrb_to_yxhw, merge_and_slice,
                                yxhw_to_ltrb)
from yolo_tpu.ops.math import sigmoid


# --------------------------------------------------------------------------
# car / VOR
# --------------------------------------------------------------------------
def decode_boxes_ltrb(box_t, grids: GridTables, size: Sequence[int]):
    """Raw (ty, tx, th, tw) -> normalised (l, t, r, b) via the grid tables
    (reference _yxhw_to_ltrb, car/YOLO.py:552-566). box_t: (B, A, n, 4)."""
    ty, tx, th, tw = jnp.split(box_t, 4, axis=-1)
    by = (sigmoid(ty) * grids.step + grids.y) / size[0]
    bx = (sigmoid(tx) * grids.step + grids.x) / size[1]
    bh = jnp.exp(th) * grids.h
    bw = jnp.exp(tw) * grids.w
    return jnp.concatenate(
        [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)


def decode_car(outputs, grids: GridTables, slice_point: Sequence[int],
               size: Sequence[int]):
    """Best-box decode. Returns (B, 6 + num_class):
    [score, y, x, h, w, rotate_raw, class_logits...] — the exact layout the
    reference's predict() hands to the video node (car/YOLO.py:568-597)."""
    parts = merge_and_slice(outputs, slice_point)
    score = sigmoid(parts[0])                          # (B, A, n, 1)
    ltrb = decode_boxes_ltrb(
        jnp.concatenate([parts[1], parts[2]], -1), grids, size)
    rest = jnp.concatenate(parts[3:], -1)
    full = jnp.concatenate([score, ltrb, rest], -1)    # (B, A, n, 5+...)

    B = full.shape[0]
    flat_score = score.reshape(B, -1)
    best = jnp.argmax(flat_score, axis=-1)             # (B,)
    flat = full.reshape(B, -1, full.shape[-1])
    pred = jnp.take_along_axis(flat, best[:, None, None], axis=1)[:, 0]
    yxhw = ltrb_to_yxhw(pred[:, 1:5])
    return jnp.concatenate([pred[:, :1], yxhw, pred[:, 5:]], -1)


def decode_car_pallas(outputs, grids: GridTables,
                      slice_point: Sequence[int], size: Sequence[int]):
    """decode_car with the argmax/select fused in VMEM
    (pallas.decode_kernel.best_cell_decode): instead of materialising the
    fully decoded (B, cells, anchors, 5+C) tensor in HBM and gathering one
    row, the kernel scans the raw merged head once and emits only the
    winning row per image; the box transform then runs on (B, 4) scalars.
    Bit-identical argmax semantics (raw score logit is monotonic in
    sigmoid). Falls back to interpret mode off-TPU.
    """
    from yolo_tpu.pallas.decode_kernel import best_cell_decode

    B = outputs[0].shape[0]
    C = outputs[0].shape[-1]
    merged = jnp.concatenate([o.reshape(B, -1, C) for o in outputs], 1)
    rows, idx = best_cell_decode(merged)          # (B, C), (B,)

    n = grids.h.shape[1]
    cell = idx // n
    anchor = idx % n
    step = grids.step[cell, anchor, 0]
    gy = grids.y[cell, anchor, 0]
    gx = grids.x[cell, anchor, 0]
    ah = grids.h[cell, anchor, 0]
    aw = grids.w[cell, anchor, 0]

    score = sigmoid(rows[:, 0:1])
    by = (sigmoid(rows[:, 1]) * step + gy) / size[0]
    bx = (sigmoid(rows[:, 2]) * step + gx) / size[1]
    bh = jnp.exp(rows[:, 3]) * ah
    bw = jnp.exp(rows[:, 4]) * aw
    yxhw = jnp.stack([by, bx, bh, bw], -1)
    return jnp.concatenate([score, yxhw, rows[:, 5:]], -1)


def decode_lp_pallas(lp_map, r_max_deg: Sequence[float]):
    """decode_lp via the fused VMEM best-cell kernel (see
    decode_car_pallas)."""
    from yolo_tpu.pallas.decode_kernel import best_cell_decode

    B = lp_map.shape[0]
    flat = lp_map.reshape(B, -1, lp_map.shape[-1])
    rows, _ = best_cell_decode(flat)
    pose = lp_pose_activation(rows[:, 1:7], r_max_deg)
    return jnp.concatenate([sigmoid(rows[:, 0:1]), pose], -1)


def decode_car_all(outputs, grids: GridTables, slice_point: Sequence[int],
                   size: Sequence[int]):
    """All-cell decode: (score (B,A,n,1), ltrb (B,A,n,4), rest) for NMS or
    analysis paths."""
    parts = merge_and_slice(outputs, slice_point)
    score = sigmoid(parts[0])
    ltrb = decode_boxes_ltrb(
        jnp.concatenate([parts[1], parts[2]], -1), grids, size)
    rest = jnp.concatenate(parts[3:], -1)
    return score, ltrb, rest


def nms_topk(score, ltrb, rest, k: int = 16, iou_thresh: float = 0.45):
    """Greedy NMS over the top-k scoring cells (fixed-shape, jittable).

    An extension over the reference (which has no NMS); returns
    (k, 1+4+rest) per image with suppressed rows' score zeroed.
    """
    B = score.shape[0]
    flat_s = score.reshape(B, -1)
    flat_b = ltrb.reshape(B, -1, 4)
    flat_r = rest.reshape(B, -1, rest.shape[-1])
    top_s, idx = jax.lax.top_k(flat_s, k)

    def per_image(s, b, r, ids):
        bb = b[ids]
        rr = r[ids]

        def body(i, keep):
            boxes_i = bb[i]
            iw = jnp.maximum(
                jnp.minimum(bb[:, 2], boxes_i[2])
                - jnp.maximum(bb[:, 0], boxes_i[0]), 0)
            ih = jnp.maximum(
                jnp.minimum(bb[:, 3], boxes_i[3])
                - jnp.maximum(bb[:, 1], boxes_i[1]), 0)
            inter = iw * ih
            area = ((bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]) +
                    (boxes_i[2] - boxes_i[0]) * (boxes_i[3] - boxes_i[1]))
            iou = inter / (area - inter + 1e-9)
            # suppress lower-ranked overlapping boxes
            sup = (jnp.arange(k) > i) & (iou > iou_thresh) & keep[i]
            return keep & ~sup

        keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
        return jnp.concatenate(
            [jnp.where(keep, s, 0.0)[:, None], bb, rr], -1)

    return jax.vmap(per_image)(top_s, flat_b, flat_r, idx)


def decode_car_topk(outputs, grids: GridTables, slice_point: Sequence[int],
                    size: Sequence[int], k: int = 16,
                    iou_thresh: float = 0.45):
    """Multi-detection decode: all-cell decode -> greedy NMS over the
    top-k cells. Returns (B, k, 1+4+rest) rows [score, l, t, r, b, ...]
    with suppressed rows' score zeroed — the multi-object extension the
    reference's argmax-only predict lacked (car/YOLO.py:584 takes one box
    per image). Used by serving paths that want every vehicle in frame.
    """
    score, ltrb, rest = decode_car_all(outputs, grids, slice_point, size)
    return nms_topk(score, ltrb, rest, k=k, iou_thresh=iou_thresh)


# --------------------------------------------------------------------------
# licence plate pose
# --------------------------------------------------------------------------
def lp_pose_activation(raw, r_max_deg: Sequence[float]):
    """[X, Y, Z, r1, r2, r3] raw head values -> mm / rad
    (car_and_LP/YOLO.py:159-169; LP_detection.py:156-161)."""
    xyz = raw[..., 0:3] * 1000.0
    r_max = jnp.asarray(r_max_deg, jnp.float32)
    r = (sigmoid(raw[..., 3:6]) - 0.5) * 2.0 * r_max * (math.pi / 180.0)
    return jnp.concatenate([xyz, r], -1)


def decode_lp(lp_map, r_max_deg: Sequence[float]):
    """Best-cell LP pose decode from the (B, gh, gw, >=7) head map.

    Returns (B, 7): [score, X, Y, Z, r1, r2, r3] (mm / rad).
    """
    B = lp_map.shape[0]
    flat = lp_map.reshape(B, -1, lp_map.shape[-1])
    score = sigmoid(flat[..., 0])
    best = jnp.argmax(score, axis=-1)
    pred = jnp.take_along_axis(flat, best[:, None, None], axis=1)[:, 0]
    pose = lp_pose_activation(pred[:, 1:7], r_max_deg)
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)
    return jnp.concatenate([best_score, pose], -1)


# --------------------------------------------------------------------------
# OCR
# --------------------------------------------------------------------------
class OCRDecoded(NamedTuple):
    scores: jnp.ndarray     # (B, area) sigmoid scores
    peak_cls: jnp.ndarray   # (B, area) int32 class at peaks, -1 elsewhere


def decode_ocr(score_logits, class_logits, threshold: float = 0.6) -> OCRDecoded:
    """Local-peak character decode (OCR/OCR.py:180-201): a column is a
    character iff sigmoid(score) > threshold and it beats both neighbours
    (zero-padded at the ends)."""
    B = score_logits.shape[0]
    s = sigmoid(score_logits.reshape(B, -1))            # (B, A)
    left = jnp.pad(s, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(s, ((0, 0), (0, 1)))[:, 1:]
    is_peak = (s > threshold) & (s > left) & (s > right)
    cls = jnp.argmax(class_logits.reshape(B, s.shape[1], -1), -1)
    return OCRDecoded(scores=s,
                      peak_cls=jnp.where(is_peak, cls, -1).astype(jnp.int32))


# single source of truth: the decoded text alphabet IS the glyph-atlas
# class list the OCR model trains on
from yolo_tpu.render.fonts import CLASS_NAMES as OCR_CLASS_NAMES

_ALPHA = set(OCR_CLASS_NAMES[10:])
_NUM = set('012356789')


def peaks_to_text(peak_cls_row) -> str:
    """Host-side: peak class row -> plate string (left to right)."""
    return ''.join(OCR_CLASS_NAMES[int(c)] for c in np.asarray(peak_cls_row)
                   if int(c) >= 0)


def is_valid_taiwan_plate(text: str) -> bool:
    """AAA-NNNN validity gate (OCR/OCR.py:150-157)."""
    return (len(text) == 7 and all(c in _ALPHA for c in text[:3])
            and all(c in _NUM for c in text[3:]))


# --------------------------------------------------------------------------
# orientation distribution -> angle
# --------------------------------------------------------------------------
def make_angle_offsets(classes):
    """cos/sin unit vectors per viewpoint bin from the spec's (azi°, ele°)
    class table (yolo_cv.RadarProb / video_node semantics)."""
    azi = np.asarray(classes, np.float32)[:, 0] * math.pi / 180.0
    return jnp.asarray(np.cos(azi)), jnp.asarray(np.sin(azi))


def cls2ang(confidence, logits, cos_off, sin_off):
    """Softmax the viewpoint distribution and take the circular expectation
    (yolo_cv.py:85-94). Returns (azimuth_rad, radius)."""
    prob = jax.nn.softmax(logits, axis=-1)
    c = jnp.sum(cos_off * prob, -1)
    s = jnp.sum(sin_off * prob, -1)
    ang = jnp.arctan2(s, c)
    rad = confidence * jnp.sqrt(s * s + c * c)
    return ang, rad
