"""Host-side visualization: rotated boxes, plate edges, viewpoint radar.

Parity with the reference's yolo_cv drawing/plotting helpers
(cv2_add_bbox yolo_cv.py:239-270, RadarProb yolo_cv.py:23-94,
add_edges licence_plate_render/__init__.py:379-402) on numpy images;
matplotlib uses the Agg backend so everything works headless.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

COLORS = [(255, 255, 0), (255, 0, 255), (0, 255, 255), (0, 0, 255),
          (0, 255, 0), (255, 0, 0), (255, 255, 255), (0, 0, 0)]


def draw_bbox(img: np.ndarray, pred: Sequence[float], color_idx: int = 4,
              use_r: bool = False, thickness: int = 2) -> np.ndarray:
    """Draw a (possibly rotated) box. ``pred`` = [score, y, x, h, w,
    rotate, ...] in normalised units (the decode output layout)."""
    import cv2
    r = 0.0 if not use_r else -float(pred[5])
    im_h, im_w = img.shape[:2]
    h = float(pred[3]) * im_h
    w = float(pred[4]) * im_w
    c, s = math.cos(r), math.sin(r)
    pts = np.array([
        [w * c / 2 - h * s / 2, w * s / 2 + h * c / 2],
        [-w * c / 2 - h * s / 2, -w * s / 2 + h * c / 2],
        [-w * c / 2 + h * s / 2, -w * s / 2 - h * c / 2],
        [w * c / 2 + h * s / 2, w * s / 2 - h * c / 2]])
    ctr = np.array([float(pred[2]) * im_w, float(pred[1]) * im_h])
    pts = (pts + ctr).astype(np.int32)[None]
    cv2.polylines(img, pts, 1, COLORS[color_idx % len(COLORS)], thickness)
    return img


def draw_plate_edges(img: np.ndarray, pose6d: Sequence[float],
                     color=(0, 0, 255), thickness: int = 2) -> np.ndarray:
    """Project a 6-DoF plate pose and draw its quad."""
    import cv2
    from yolo_tpu.ops.geometry import CameraIntrinsics, np_project_corners
    cam = CameraIntrinsics()
    pts = np_project_corners(pose6d)
    pts[:, 0] *= img.shape[1] / float(cam.width)
    pts[:, 1] *= img.shape[0] / float(cam.height)
    cv2.polylines(img, pts[None].astype(np.int32), 1, color, thickness)
    return img


def draw_ocr_trace(img: np.ndarray, scores: np.ndarray,
                   text: str = "", color=(255, 0, 0)) -> np.ndarray:
    """Overlay the OCR per-column score trace + decoded text on a plate
    strip (OCR/OCR.py:146-165 semantics)."""
    import cv2
    area = len(scores)
    h, w = img.shape[:2]
    xs = np.arange(w // (2 * area), w, w // area)[:area].reshape(-1, 1)
    ys = ((1 - scores) * h).reshape(-1, 1)
    pts = np.concatenate([xs, ys], -1)[None].astype(np.int32)
    cv2.polylines(img, pts, 0, color, 2)
    if text:
        cv2.putText(img, text, (0, 60), 2, 2, (0, 0, 255), 2)
    return img


class RadarProb:
    """Viewpoint-distribution plots (polar trace / hemisphere heat wheel)
    and the distribution -> angle decode. Headless: ``plot``/``plot3d``
    render into an Agg figure; ``savefig``/``to_image`` extract it."""

    def __init__(self, num_cls: int, classes=None):
        step = 360.0 / num_cls
        ang = np.arange(0, 360, step) * np.pi / 180.0
        self.cos_offset = np.cos(ang)
        self.sin_offset = np.sin(ang)
        self.classes = np.asarray(classes, np.float32) \
            if classes is not None else None
        self._fig = None
        self._ax = None

    def _ensure_fig(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        if self._fig is None:
            self._fig = plt.figure(figsize=(4, 4))
            self._ax = self._fig.add_subplot(111, polar=True)
        return self._ax

    def cls2ang(self, confidence: float, logits: np.ndarray):
        """Circular expectation of the softmaxed distribution
        (yolo_cv.py:85-94)."""
        e = np.exp(logits - logits.max())
        prob = e / e.sum()
        n = min(len(prob), len(self.cos_offset))
        c = float(np.sum(self.cos_offset[:n] * prob[:n]))
        s = float(np.sum(self.sin_offset[:n] * prob[:n]))
        vec_ang = math.atan2(s, c)
        vec_rad = confidence * (s * s + c * c) ** 0.5
        return vec_ang, vec_rad, confidence * prob

    def plot(self, confidence: float, logits: np.ndarray):
        ax = self._ensure_fig()
        vec_ang, vec_rad, prob = self.cls2ang(confidence, logits)
        n = len(prob)
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ang = np.concatenate([ang, ang[:1]])
        prob = np.concatenate([prob, prob[:1]])
        ax.clear()
        ax.plot([0, vec_ang], [0, vec_rad], "r-", linewidth=3)
        ax.plot(ang, prob, "b-", linewidth=1)
        ax.set_ylim(0, 1)
        return vec_ang, vec_rad

    def plot3d(self, confidence: float, logits: np.ndarray,
               rings: Sequence[int] = (24, 21, 17, 12)):
        """Hemisphere wheel: one polar ring per elevation band, cells
        shaded by probability (yolo_cv.py:41-68)."""
        ax = self._ensure_fig()
        e = np.exp(logits - logits.max())
        prob = e / e.sum()
        prob = prob * confidence / max(prob.max(), 1e-9)
        ax.clear()
        c = 0
        for ele, n_ang in enumerate(rings):
            if c + n_ang > len(prob):
                break
            ang = np.linspace(0, 2 * np.pi, n_ang, endpoint=False)
            width = np.pi * 2 / n_ang + 0.02
            top = 1.0 - ele / len(rings)
            bars = ax.bar(ang, [top] * n_ang, width=width,
                          bottom=top - 1.0 / len(rings), linewidth=0)
            for p, bar in zip(prob[c:c + n_ang], bars):
                bar.set_facecolor((p, p, p))
            c += n_ang
        ax.set_title(f"{confidence:.2f}")
        ax.grid(False)

    def to_image(self) -> Optional[np.ndarray]:
        if self._fig is None:
            return None
        self._fig.canvas.draw()
        buf = np.asarray(self._fig.canvas.buffer_rgba())
        return buf[..., :3].copy()

    def savefig(self, path: str):
        if self._fig is not None:
            self._fig.savefig(path)
