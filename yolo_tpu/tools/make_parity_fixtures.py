"""Generate golden parity fixtures replicating the reference's math.

Writes ``tests/fixtures/parity.npz`` containing recorded input/output
pairs computed with an INDEPENDENT numpy re-derivation of the reference
semantics — different code path from the framework's jax implementations,
so the parity tests in tests/test_parity.py are a real cross-check:

* plate-corner projection — the hand-expanded sympy closed form of
  ``ProjectRectangle6D.projection_matrix`` (reference
  yolo_modules/licence_plate_render/__init__.py:352-377), including its
  hard-coded 199.5 x 84.0 mm half-extents;
* LP pose decode — ``predict_LP`` (licence_plate/LP_detection.py:147-162):
  best score cell, sigmoid score, x1000 XYZ,
  (sigmoid-0.5)*2*r_max*pi/180 angles;
* car box decode — ``predict`` + ``_yxhw_to_ltrb`` + ``_init_syxhw``
  grid tables (car/YOLO.py:123-155,552-597);
* OCR peak decode — the zero-padded strict local-peak loop
  (OCR/OCR.py:188-199).

Run from the repo root:  python -m yolo_tpu.tools.make_parity_fixtures
"""
from __future__ import annotations

import math
import os

import numpy as np

# C310 calibration constants (camera_parameter/C310_4.yaml projection
# matrix entries — the values the whole reference LPD pipeline bakes in)
FX, FY = 890.037231, 889.150513
CX, CY = 314.129602, 220.037739


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


# --------------------------------------------------------------------------
# 1. plate corners: the reference's hand-expanded closed form
# --------------------------------------------------------------------------
def reference_project_corners(pose):
    """Direct transliteration of the a..h expansion (reference
    __init__.py:352-377) — NOT the matrix-product form the framework uses."""
    X, Y, Z, r1, r2, r3 = [float(v) for v in pose]
    sin, cos = math.sin, math.cos

    a = sin(r1) * cos(r2) * 84.0
    b = sin(r1) * sin(r2) * cos(r3) * 84.0
    c = sin(r2) * 199.5
    d = sin(r3) * cos(r1) * 84.0
    e = cos(r2) * cos(r3) * 199.5
    f = sin(r1) * sin(r2) * sin(r3) * 84.0
    g = sin(r3) * cos(r2) * 199.5
    h = cos(r1) * cos(r3) * 84.0

    ans = np.array([
        [CX * (Z + a - c) + FX * (X + b - d + e),
         CX * (Z + a + c) + FX * (X + b - d - e),
         CX * (Z - a + c) + FX * (X - b + d - e),
         CX * (Z - a - c) + FX * (X - b + d + e)],
        [CY * (Z + a - c) + FY * (Y + f + g + h),
         CY * (Z + a + c) + FY * (Y + f - g + h),
         CY * (Z - a + c) + FY * (Y - f - g - h),
         CY * (Z - a - c) + FY * (Y - f + g - h)],
        [Z + a - c, Z + a + c, Z - a + c, Z - a - c]], np.float64)

    pts = np.zeros((4, 2), np.float64)
    for i in range(4):
        pts[i, 0] = ans[0, i] / ans[2, i]
        pts[i, 1] = ans[1, i] / ans[2, i]
    return pts


def sample_poses():
    """Deterministic pose battery over the reference training ranges
    (Z in [1500, 5000] mm; rotations within LP_r_max [45, 60, 45] deg)."""
    poses = []
    rng = np.random.default_rng(2026)
    for Z in (1500.0, 2500.0, 4000.0, 5000.0):
        for _ in range(3):
            X = float(rng.uniform(-1, 1)) * Z * 9.0 / 30.0
            Y = float(rng.uniform(-1, 1)) * Z * 6.0 / 30.0
            r = rng.uniform(-1, 1, 3) * np.radians([45.0, 60.0, 45.0])
            poses.append([X, Y, Z, float(r[0]), float(r[1]), float(r[2])])
    return np.asarray(poses, np.float64)


# --------------------------------------------------------------------------
# 2. LP pose decode (predict_LP semantics)
# --------------------------------------------------------------------------
def reference_predict_lp(lp_map, r_max_deg):
    """lp_map: (B, gh, gw, C) — the NHWC view the reference builds by
    transposing its NCHW executor output (LP_detection.py:148)."""
    B = lp_map.shape[0]
    preds = []
    for i in range(B):
        out = lp_map[i]
        best_index = int(out[:, :, 0].reshape(-1).argmax(axis=0))
        out = out.reshape((-1, out.shape[-1]))
        pred = out[best_index].astype(np.float64).copy()
        pred[0] = np_sigmoid(pred[0])
        pred[1:4] *= 1000
        for k in range(3):
            p = (np_sigmoid(pred[k + 4]) - 0.5) * 2 * r_max_deg[k]
            pred[k + 4] = p * math.pi / 180.0
        preds.append(pred[:7])
    return np.asarray(preds)


# --------------------------------------------------------------------------
# 3. car box decode (predict + _init_syxhw semantics)
# --------------------------------------------------------------------------
def reference_syxhw(size, layers_count, all_anchors):
    """Grid tables per _init_step/_init_area/_init_syxhw
    (car/YOLO.py:112-155): steps 2^(prymaid_start+i), cell tables as
    flat (sum(area), n, 1) columns, shallow level first, row-major."""
    num_pyr = len(all_anchors)
    pry_start = layers_count - num_pyr + 1
    steps = [2 ** (pry_start + i) for i in range(num_pyr)]
    area = [int(size[0] * size[1] / s ** 2) for s in steps]
    n = len(all_anchors[0])

    s_t = np.zeros((sum(area), n, 1))
    y_t = np.zeros((sum(area), n, 1))
    x_t = np.zeros((sum(area), n, 1))
    h_t = np.zeros((sum(area), n, 1))
    w_t = np.zeros((sum(area), n, 1))
    a_start = 0
    for i, anchors in enumerate(all_anchors):
        a = area[i]
        step = steps[i]
        x_num = int(size[1] / step)
        y = np.repeat(np.arange(0, size[0], step), n * x_num)
        x = np.tile(np.repeat(np.arange(0, size[1], step), n),
                    int(size[0] / step))
        hw = np.tile(np.asarray(anchors, np.float64), (a, 1))
        s_t[a_start:a_start + a] = np.full((a, n, 1), step, np.float64)
        y_t[a_start:a_start + a] = y.reshape(a, n, 1)
        x_t[a_start:a_start + a] = x.reshape(a, n, 1)
        h_t[a_start:a_start + a] = hw[:, 0].reshape(a, n, 1)
        w_t[a_start:a_start + a] = hw[:, 1].reshape(a, n, 1)
        a_start += a
    return steps, area, (s_t, y_t, x_t, h_t, w_t)


def reference_predict_car(outputs, size, layers_count, all_anchors,
                          slice_point):
    """outputs: list of (B, area_i, n, C) per level, shallow-first —
    the shape contract of merge_and_slice (car/YOLO.py:841-849)."""
    _, _, (s_t, y_t, x_t, h_t, w_t) = reference_syxhw(
        size, layers_count, all_anchors)
    out = np.concatenate([np.asarray(o, np.float64) for o in outputs],
                         axis=1)
    B = out.shape[0]
    score = np_sigmoid(out[..., 0:1])
    ty = out[..., 1:2]
    tx = out[..., 2:3]
    th = out[..., 3:4]
    tw = out[..., 4:5]
    by = (np_sigmoid(ty) * s_t[None] + y_t[None]) / size[0]
    bx = (np_sigmoid(tx) * s_t[None] + x_t[None]) / size[1]
    bh = np.exp(th) * h_t[None]
    bw = np.exp(tw) * w_t[None]
    l, r = bx - bw / 2, bx + bw / 2
    t, b = by - bh / 2, by + bh / 2
    full = np.concatenate([score, l, t, r, b, out[..., 5:]], -1)

    preds = []
    for i in range(B):
        best = int(score[i].reshape(-1).argmax(axis=0))
        pred = full[i].reshape(-1, full.shape[-1])[best].copy()
        y_c = (pred[2] + pred[4]) / 2
        x_c = (pred[1] + pred[3]) / 2
        h_c = pred[4] - pred[2]
        w_c = pred[3] - pred[1]
        pred[1:5] = [y_c, x_c, h_c, w_c]
        preds.append(pred)
    return np.asarray(preds)


# --------------------------------------------------------------------------
# 4. OCR peak decode
# --------------------------------------------------------------------------
def reference_predict_ocr(score_logits, class_logits):
    """Returns per-column class at strict local peaks, -1 elsewhere
    (OCR/OCR.py:188-199; columns compared against zero-padded ends)."""
    B, A = score_logits.shape
    peaks = np.full((B, A), -1, np.int64)
    for bi in range(B):
        score_x = np_sigmoid(score_logits[bi].astype(np.float64))
        score_x2 = np.concatenate(([0], score_x, [0]))
        for i in range(A):
            if (score_x2[i + 1] > 0.6 and score_x2[i + 1] > score_x2[i + 2]
                    and score_x2[i + 1] > score_x2[i]):
                peaks[bi, i] = int(np.argmax(class_logits[bi, i]))
    return peaks


def main(out_path: str = "tests/fixtures/parity.npz"):
    rng = np.random.default_rng(7)

    poses = sample_poses()
    corners = np.stack([reference_project_corners(p) for p in poses])

    r_max = [45.0, 60.0, 45.0]
    lp_map = rng.normal(0, 1.5, (2, 10, 16, 10)).astype(np.float32)
    lp_pred = reference_predict_lp(lp_map, r_max)

    # car_v1 contract: 320x512, 6 downsample stages, 3 levels x 3 anchors,
    # slice_point [1, 3, 5, 6, 30]
    size = (320, 512)
    all_anchors = [
        [[0.2216, 0.1552], [0.2144, 0.2408], [0.2825, 0.3456]],
        [[0.3959, 0.2706], [0.3703, 0.4351], [0.5708, 0.4278]],
        [[0.4345, 0.6063], [0.5584, 0.7174], [0.7448, 0.6772]]]
    steps, area, _ = reference_syxhw(size, 6, all_anchors)
    car_outs = [rng.normal(0, 1.0, (1, a, 3, 30)).astype(np.float32)
                for a in area]
    car_pred = reference_predict_car(car_outs, size, 6, all_anchors,
                                     [1, 3, 5, 6, 30])

    ocr_score = rng.normal(0, 2.0, (4, 24)).astype(np.float32)
    ocr_class = rng.normal(0, 1.0, (4, 24, 34)).astype(np.float32)
    ocr_peaks = reference_predict_ocr(ocr_score, ocr_class)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        poses=poses.astype(np.float32), corners=corners.astype(np.float32),
        lp_r_max=np.asarray(r_max, np.float32),
        lp_map=lp_map, lp_pred=lp_pred.astype(np.float32),
        car_steps=np.asarray(steps, np.int32),
        car_out0=car_outs[0], car_out1=car_outs[1], car_out2=car_outs[2],
        car_pred=car_pred.astype(np.float32),
        ocr_score=ocr_score, ocr_class=ocr_class, ocr_peaks=ocr_peaks)
    print(f"wrote {out_path}: corners {corners.shape}, lp {lp_pred.shape}, "
          f"car {car_pred.shape} (steps {steps}), ocr {ocr_peaks.shape}")


if __name__ == "__main__":
    main()
