"""Accuracy evaluation harnesses on held-out synthetic data.

The parity anchors from BASELINE.md: OCR string/char accuracy,
plate-corner IoU for the 6-DoF pose, box IoU + azimuth error for VOR.
Evaluation data comes from the same on-device renderers with a held-out
RNG stream — the reference validated the same way (its renderers are its
only data source for LPD/OCR).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.decode import (decode_car, decode_lp, decode_ocr,
                             peaks_to_text)
from yolo_tpu.ops.boxes import iou_ltrb, make_grid_tables, yxhw_to_ltrb
from yolo_tpu.ops.geometry import PlateProjector
from yolo_tpu.render import (CarRenderer, LPRenderer, procedural_backgrounds)
from yolo_tpu.render.fonts import CLASS_NAMES


def eval_ocr(task, variables, batches: int = 10, batch: int = 64,
             seed: int = 1234, threshold: float = 0.6) -> Dict[str, float]:
    """Render plate strips, decode, compare char sequences."""
    h, w = task.spec.size
    renderer = LPRenderer(h, w)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(variables, key):
        k1, k2 = jax.random.split(key)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, labels = renderer.render(k2, bg)
        score_x, class_x = task.apply_eval(variables, imgs)
        o = decode_ocr(score_x.astype(jnp.float32),
                       class_x.astype(jnp.float32), threshold=threshold)
        return labels, o.peak_cls

    exact = 0
    char_hits = 0
    char_total = 0
    total = 0
    for b in range(batches):
        key, k = jax.random.split(key)
        labels, peaks = run(variables, k)
        labels = np.asarray(labels)
        peaks = np.asarray(peaks)
        for i in range(batch):
            order = np.argsort(labels[i, :, 1])
            truth = "".join(CLASS_NAMES[int(c)]
                            for c in labels[i, order, 0] if c >= 0)
            pred = peaks_to_text(peaks[i])
            total += 1
            exact += int(pred == truth)
            # char accuracy via aligned comparison (same length fast path)
            n = min(len(pred), len(truth))
            char_hits += sum(p == t for p, t in zip(pred[:n], truth[:n]))
            char_total += len(truth)
    return {"ocr_exact_match": exact / total,
            "ocr_char_accuracy": char_hits / max(char_total, 1),
            "samples": total}


def _corner_bbox(corners: np.ndarray) -> np.ndarray:
    return np.asarray([corners[:, 0].min(), corners[:, 1].min(),
                       corners[:, 0].max(), corners[:, 1].max()])


def _corner_iou(tc: np.ndarray, pc: np.ndarray) -> float:
    """Axis-aligned bbox IoU of two (4, 2) corner quads (the reference's
    plate-pose metric; shared by the LPD/cascade/joint evals)."""
    tb, pb = _corner_bbox(tc), _corner_bbox(pc)
    iw = max(min(tb[2], pb[2]) - max(tb[0], pb[0]), 0)
    ih = max(min(tb[3], pb[3]) - max(tb[1], pb[1]), 0)
    inter = iw * ih
    a1 = (tb[2] - tb[0]) * (tb[3] - tb[1])
    a2 = (pb[2] - pb[0]) * (pb[3] - pb[1])
    return inter / max(a1 + a2 - inter, 1e-9)


def _softmax_azimuth_deg(logits: np.ndarray,
                         azi_bins_deg: np.ndarray) -> float:
    """Softmax circular-expectation azimuth in degrees (the numpy twin
    of decode.cls2ang, video_node.py:245-251 semantics)."""
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    rad = np.radians(azi_bins_deg)
    c = float(np.sum(np.cos(rad) * p))
    s = float(np.sum(np.sin(rad) * p))
    return math.degrees(math.atan2(s, c))


def eval_lpd(task, variables, batches: int = 10, batch: int = 32,
             seed: int = 1234, r_max=(45.0, 60.0, 45.0)) -> Dict[str, float]:
    """Render plate scenes, decode pose, compare plate corners.

    Reports mean plate-corner-bbox IoU (pred vs truth corner projections),
    detection rate (score at the right cell), and pose errors.
    """
    h, w = task.spec.size
    renderer = LPRenderer(h, w)
    proj = PlateProjector()
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(variables, key):
        k1, k2 = jax.random.split(key)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, labels = renderer.add(k2, bg, tuple(r_max), add_rate=1.0)
        out = task.apply_eval(variables, imgs)
        lp = decode_lp(out.astype(jnp.float32), list(r_max))
        return labels, lp

    ious, z_errs, ang_errs, scores = [], [], [], []
    for b in range(batches):
        key, k = jax.random.split(key)
        labels, lp = run(variables, k)
        labels = np.asarray(labels)
        lp = np.asarray(lp)
        for i in range(batch):
            truth_pose = labels[i, 0, 1:7]
            pred_pose = lp[i, 1:7]
            tc = np.asarray(proj.corners_in_image(
                jnp.asarray(truth_pose), (h, w)))
            pc = np.asarray(proj.corners_in_image(
                jnp.asarray(pred_pose), (h, w)))
            ious.append(_corner_iou(tc, pc))
            z_errs.append(abs(pred_pose[2] - truth_pose[2]))
            ang_errs.append(np.mean(np.abs(pred_pose[3:] - truth_pose[3:])))
            scores.append(lp[i, 0])
    return {"lpd_corner_iou": float(np.mean(ious)),
            "lpd_z_mae_mm": float(np.mean(z_errs)),
            "lpd_rot_mae_rad": float(np.mean(ang_errs)),
            "lpd_mean_score": float(np.mean(scores)),
            "samples": len(ious)}


def eval_cascade(lp_task, lp_variables, ocr_task, ocr_variables,
                 batches: int = 8, batch: int = 32, seed: int = 99,
                 r_max=(45.0, 60.0, 45.0), **pipeline_kw
                 ) -> Dict[str, float]:
    """END-TO-END ALPR accuracy: scenes -> LPD pose -> unwarp with the
    PREDICTED pose -> OCR -> plate string, compared to the rendered truth.

    This is the full fused serving path (pipeline.ALPRPipeline) under
    measurement — the reference never quantified its cascade.
    """
    from yolo_tpu.pipeline import ALPRPipeline

    h, w = lp_task.spec.size
    renderer = LPRenderer(h, w)
    pipe = ALPRPipeline(lp_task, ocr_task, **pipeline_kw)
    key = jax.random.PRNGKey(seed)

    # `add` draws plate text internally; render with explicit chars so the
    # ground-truth string is known.
    @jax.jit
    def run_known(lp_variables, ocr_variables, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bg = procedural_backgrounds(k1, batch, h, w)
        chars = renderer.sample_chars(k2, batch)
        inks = renderer.draw_plates(chars)
        poses = jax.vmap(lambda k: renderer.sample_pose(k, tuple(r_max)))(
            jax.random.split(k3, batch))
        rgb, alpha, centre = jax.vmap(renderer._project_one)(inks, poses)
        imgs = jnp.clip(bg * (1 - alpha) + rgb * alpha, 0, 1)
        res = pipe(lp_variables, ocr_variables, imgs)
        return chars, poses, res

    exact = 0
    char_hits = 0
    char_total = 0
    total = 0
    ious = []
    proj = PlateProjector()
    for b in range(batches):
        key, k = jax.random.split(key)
        chars, poses, res = run_known(lp_variables, ocr_variables, k)
        chars = np.asarray(chars)
        poses = np.asarray(poses)
        for i in range(batch):
            truth = "".join(CLASS_NAMES[int(c)] for c in chars[i])
            pred = peaks_to_text(np.asarray(res.ocr_cls[i]))
            total += 1
            exact += int(pred == truth)
            n = min(len(pred), len(truth))
            char_hits += sum(p == t for p, t in zip(pred[:n], truth[:n]))
            char_total += len(truth)
            tc = np.asarray(proj.corners_in_image(
                jnp.asarray(poses[i]), (h, w)))
            pc = np.asarray(res.corners[i])
            ious.append(_corner_iou(tc, pc))
    return {"cascade_exact_match": exact / total,
            "cascade_char_accuracy": char_hits / max(char_total, 1),
            "cascade_corner_iou": float(np.mean(ious)),
            "samples": total}


def eval_joint(task, variables, batches: int = 8, batch: int = 24,
               seed: int = 1234, car_assets=None) -> Dict[str, float]:
    """Joint (CarLPNet) accuracy on composed car+plate scenes: car box
    IoU + azimuth error from the pyramid heads AND plate pose metrics
    from the LP branch — the dual-task validation the reference's joint
    valid mode eyeballed (car_and_LP/YOLO.py:339-384)."""
    spec = task.spec
    h, w = spec.size
    car_r = CarRenderer(h, w, spec.classes, pool=car_assets)
    lp_r = LPRenderer(h, w)
    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    cls = np.asarray(spec.classes, np.float32)
    proj = PlateProjector()
    r_max = tuple(spec.LP_r_max)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(variables, key):
        k1, k2, k3 = jax.random.split(key, 3)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, car_labels = car_r.render(k2, bg, render_rate=1.0)
        imgs, lp_labels = lp_r.add(k3, imgs, r_max, add_rate=1.0)
        car_out, lp_map = task.apply_eval(variables, imgs)
        pred = decode_car([o.astype(jnp.float32) for o in car_out],
                          grids, spec.slice_point, spec.size)
        lp = decode_lp(lp_map.astype(jnp.float32), list(r_max))
        pred_ltrb = yxhw_to_ltrb(pred[:, 1:5])
        ious = jax.vmap(iou_ltrb)(pred_ltrb, car_labels[:, 0, 1:5])
        return car_labels, lp_labels, pred, lp, ious

    all_iou, azi_err, lp_ious, z_errs = [], [], [], []
    for b in range(batches):
        key, k = jax.random.split(key)
        car_labels, lp_labels, pred, lp, ious = run(variables, k)
        car_labels = np.asarray(car_labels)
        lp_labels = np.asarray(lp_labels)
        pred = np.asarray(pred)
        lp = np.asarray(lp)
        all_iou.extend(np.asarray(ious).reshape(-1).tolist())
        for i in range(batch):
            true_cls = int(car_labels[i, 0, 0])
            if true_cls >= 0:
                err = _softmax_azimuth_deg(pred[i, 6:], cls[:, 0]) - \
                    cls[true_cls, 0]
                azi_err.append(abs((err + 180) % 360 - 180))
            if lp_labels[i, 0, 0] > 0:
                tc = np.asarray(proj.corners_in_image(
                    jnp.asarray(lp_labels[i, 0, 1:7]), (h, w)))
                pc = np.asarray(proj.corners_in_image(
                    jnp.asarray(lp[i, 1:7]), (h, w)))
                lp_ious.append(_corner_iou(tc, pc))
                z_errs.append(abs(lp[i, 3] - lp_labels[i, 0, 3]))
    return {"car_mean_iou": float(np.mean(all_iou)),
            "car_azimuth_mae_deg": float(np.mean(azi_err)),
            "lp_corner_iou": float(np.mean(lp_ious)),
            "lp_z_mae_mm": float(np.mean(z_errs)),
            "samples": len(all_iou)}


def eval_joint_cascade(joint_task, joint_variables, ocr_task, ocr_variables,
                       batches: int = 8, batch: int = 24, seed: int = 99,
                       car_assets=None, **pipeline_kw) -> Dict[str, float]:
    """END-TO-END accuracy of the JOINT serving path: car+plate scenes ->
    CarLPNet -> car box/viewpoint + LP pose -> predicted-pose unwarp ->
    OCR -> plate string. Same measurement as ``eval_cascade`` but through
    ``pipeline.JointPipeline`` on the joint net — the single fused program
    that replaces the reference's carLP_video_node + OCR ROS pair
    (car_and_LP/carLP_video_node.py:48-86 -> OCR/OCR.py:240-252)."""
    from yolo_tpu.pipeline import JointPipeline

    spec = joint_task.spec
    h, w = spec.size
    car_r = CarRenderer(h, w, spec.classes, pool=car_assets)
    lp_r = LPRenderer(h, w)
    pipe = JointPipeline(joint_task, ocr_task, **pipeline_kw)
    proj = PlateProjector()
    cls = np.asarray(spec.classes, np.float32)
    r_max = tuple(spec.LP_r_max)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(joint_variables, ocr_variables, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, car_labels = car_r.render(k2, bg, render_rate=1.0)
        # composite a plate with KNOWN chars (lp_r.add draws its own)
        chars = lp_r.sample_chars(k3, batch)
        inks = lp_r.draw_plates(chars)
        poses = jax.vmap(lambda k: lp_r.sample_pose(k, r_max))(
            jax.random.split(k4, batch))
        rgb, alpha, _ = jax.vmap(lp_r._project_one)(inks, poses)
        imgs = jnp.clip(imgs * (1 - alpha) + rgb * alpha, 0, 1)
        res = pipe(joint_variables, ocr_variables, imgs)
        return car_labels, chars, poses, res

    exact = char_hits = char_total = total = 0
    car_ious, azi_err, lp_ious, z_errs = [], [], [], []
    for b in range(batches):
        key, k = jax.random.split(key)
        car_labels, chars, poses, res = run(joint_variables, ocr_variables, k)
        car_labels = np.asarray(car_labels)
        chars = np.asarray(chars)
        poses = np.asarray(poses)
        car = np.asarray(res.car)
        corners = np.asarray(res.corners)
        lp = np.asarray(res.lp)
        ocr_cls = np.asarray(res.ocr_cls)
        # iou_ltrb takes the LABEL in yxhw form (ops/boxes.py:43); only the
        # prediction side is converted to ltrb
        ious = np.asarray(jax.vmap(iou_ltrb)(
            yxhw_to_ltrb(jnp.asarray(car[:, 1:5])),
            jnp.asarray(car_labels[:, 0, 1:5])))
        for i in range(batch):
            truth = "".join(CLASS_NAMES[int(c)] for c in chars[i])
            pred = peaks_to_text(ocr_cls[i])
            total += 1
            exact += int(pred == truth)
            n = min(len(pred), len(truth))
            char_hits += sum(p == t for p, t in zip(pred[:n], truth[:n]))
            char_total += len(truth)
            tc = np.asarray(proj.corners_in_image(
                jnp.asarray(poses[i]), (h, w)))
            lp_ious.append(_corner_iou(tc, corners[i]))
            z_errs.append(abs(float(lp[i, 3]) - float(poses[i, 2])))
            true_cls = int(car_labels[i, 0, 0])
            if true_cls >= 0:
                car_ious.append(float(ious[i]))
                err = _softmax_azimuth_deg(car[i, 6:], cls[:, 0]) - \
                    cls[true_cls, 0]
                azi_err.append(abs((err + 180) % 360 - 180))
    return {"cascade_exact_match": exact / total,
            "cascade_char_accuracy": char_hits / max(char_total, 1),
            "cascade_corner_iou": float(np.mean(lp_ious)),
            "cascade_z_mae_mm": float(np.mean(z_errs)),
            "car_mean_iou": float(np.mean(car_ious)),
            "car_azimuth_mae_deg": float(np.mean(azi_err)),
            "samples": total}


def eval_car_multi(task, variables, batches: int = 8, batch: int = 24,
                   seed: int = 1234, num_obj: int = 3, k: int = 8,
                   iou_match: float = 0.5, score_thresh: float = 0.5,
                   nms_iou: float = 0.45, car_assets=None
                   ) -> Dict[str, float]:
    """Multi-object VOR accuracy: N-car scenes -> top-k NMS decode ->
    greedy IoU matching. Reports detection recall@iou_match, mean
    matched IoU, azimuth MAE over matches, and false positives/image.

    The reference could render only one car per image and its predict
    decoded one argmax box (car/YOLO.py:584); this exercises the
    multi-object path (render num_obj slots + decode_car_topk).
    """
    from yolo_tpu.decode import decode_car_topk

    spec = task.spec
    h, w = spec.size
    renderer = CarRenderer(h, w, spec.classes, pool=car_assets)
    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    cls = np.asarray(spec.classes, np.float32)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(variables, key):
        k1, k2 = jax.random.split(key)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, labels = renderer.render(k2, bg, render_rate=1.0,
                                       num_obj=num_obj)
        out = task.apply_eval(variables, imgs)
        if task.kind == "carlp":
            out = out[0]
        top = decode_car_topk([o.astype(jnp.float32) for o in out],
                              grids, spec.slice_point, spec.size, k=k,
                              iou_thresh=nms_iou)
        return labels, top

    n_gt = n_matched = 0
    fp = 0
    matched_ious, azi_err = [], []
    n_images = 0
    for b in range(batches):
        key, kk = jax.random.split(key)
        labels, top = run(variables, kk)
        labels = np.asarray(labels)
        top = np.asarray(top)
        for i in range(batch):
            n_images += 1
            gts = labels[i][labels[i, :, 0] >= 0]       # (G, 6+C)
            preds = top[i][top[i, :, 0] >= score_thresh]  # (P, 30)
            used = np.zeros(len(preds), bool)
            n_gt += len(gts)
            for gt in gts:
                gy, gx, gh, gw = gt[1:5]
                gl, gr = gx - gw / 2, gx + gw / 2
                gt_, gb = gy - gh / 2, gy + gh / 2
                best_j, best_iou = -1, 0.0
                for j, p in enumerate(preds):
                    if used[j]:
                        continue
                    l, t, r, bo = p[1:5]
                    iw = max(min(r, gr) - max(l, gl), 0)
                    ih = max(min(bo, gb) - max(t, gt_), 0)
                    inter = iw * ih
                    union = ((r - l) * (bo - t) +
                             (gr - gl) * (gb - gt_) - inter)
                    iou = inter / max(union, 1e-9)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_j >= 0 and best_iou >= iou_match:
                    used[best_j] = True
                    n_matched += 1
                    matched_ious.append(best_iou)
                    err = _softmax_azimuth_deg(preds[best_j, 6:],
                                               cls[:, 0]) - \
                        cls[int(gt[0]), 0]
                    azi_err.append(abs((err + 180) % 360 - 180))
            fp += int((~used).sum())
    return {"multi_recall": n_matched / max(n_gt, 1),
            "multi_matched_iou": float(np.mean(matched_ious))
            if matched_ious else 0.0,
            "multi_azimuth_mae_deg": float(np.mean(azi_err))
            if azi_err else -1.0,
            "multi_fp_per_image": fp / max(n_images, 1),
            "num_obj": num_obj, "gt_objects": n_gt,
            "score_thresh": score_thresh, "nms_iou": nms_iou,
            "samples": n_images}


def eval_car(task, variables, batches: int = 10, batch: int = 32,
             seed: int = 1234, car_assets=None) -> Dict[str, float]:
    """Render car scenes, decode, report mean box IoU + azimuth error."""
    spec = task.spec
    h, w = spec.size
    renderer = CarRenderer(h, w, spec.classes, pool=car_assets)
    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    cls = np.asarray(spec.classes, np.float32)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(variables, key):
        k1, k2 = jax.random.split(key)
        bg = procedural_backgrounds(k1, batch, h, w)
        imgs, labels = renderer.render(k2, bg, render_rate=1.0)
        out = task.apply_eval(variables, imgs)
        if task.kind == "carlp":
            out = out[0]
        # f32 decode regardless of serving dtype: bf16 sigmoid/exp and
        # argmax would make this eval incomparable with the sibling
        # evals (eval_joint / eval_car_multi / eval_lpd all cast)
        pred = decode_car([o.astype(jnp.float32) for o in out],
                          grids, spec.slice_point, spec.size)
        pred_ltrb = yxhw_to_ltrb(pred[:, 1:5])
        ious = jax.vmap(iou_ltrb)(pred_ltrb, labels[:, 0, 1:5])
        return labels, pred, ious

    all_iou, azi_err = [], []
    for b in range(batches):
        key, k = jax.random.split(key)
        labels, pred, ious = run(variables, k)
        labels = np.asarray(labels)
        pred = np.asarray(pred)
        all_iou.extend(np.asarray(ious).reshape(-1).tolist())
        for i in range(batch):
            true_cls = int(labels[i, 0, 0])
            if true_cls < 0:
                continue
            err = _softmax_azimuth_deg(pred[i, 6:], cls[:, 0]) - \
                cls[true_cls, 0]
            azi_err.append(abs((err + 180) % 360 - 180))
    return {"car_mean_iou": float(np.mean(all_iou)),
            "car_azimuth_mae_deg": float(np.mean(azi_err)),
            "samples": len(all_iou)}
