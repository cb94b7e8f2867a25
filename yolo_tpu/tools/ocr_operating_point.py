"""Cascade OCR operating-point sweep + failure diagnosis (no retraining).

The 512-plate fused-cascade eval reads 95.9% exact / 98.4% char with
lp_v5 x ocr_v4 (reports/eval_cascade_highn_ocr4.json); the round-4
verdict asked for >=97% exact or a close-out showing where the residual
lives. The reference hard-codes its peak threshold at 0.6
(/root/reference/OCR/OCR.py:180-201 — sigmoid > 0.6 and greater than
both neighbours); this tool measures, from ONE device run over the same
rendered distribution as the high-n eval:

  * exact/char accuracy at a grid of peak thresholds (decode-level
    operating points — recomputed on host from the full score/class
    maps, identical peak semantics to decode.decode_ocr);
  * a diagnosis of every failure at the default threshold: peak-count
    error (missed/spurious character columns) vs substitution (right
    columns, wrong class), and the mean predicted-pose corner IoU of
    failed vs passed plates (is the residual pose-driven or OCR-driven?).

    python -m yolo_tpu.tools.ocr_operating_point \
        --lp trained/lp_v5 --ocr trained/ocr_v4 --batches 16 \
        --out reports/ocr_operating_point.json
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import builtin_spec
from yolo_tpu.decode import OCR_CLASS_NAMES
from yolo_tpu.ops.geometry import PlateProjector
from yolo_tpu.ops.math import sigmoid
from yolo_tpu.pipeline import ALPRPipeline
from yolo_tpu.render import LPRenderer, procedural_backgrounds
from yolo_tpu.render.fonts import CLASS_NAMES
from yolo_tpu.tools.cascade_eval import load_variables
from yolo_tpu.tools.evaluate import _corner_iou
from yolo_tpu.train import make_task


def peaks(scores: np.ndarray, thresh: float) -> np.ndarray:
    """decode.decode_ocr peak rule on host: sigmoid score beats the
    threshold AND both zero-padded neighbours. scores: (B, A) sigmoid."""
    left = np.pad(scores, ((0, 0), (1, 0)))[:, :-1]
    right = np.pad(scores, ((0, 0), (0, 1)))[:, 1:]
    return (scores > thresh) & (scores > left) & (scores > right)


def text_at(scores_row, cls_row, thresh: float) -> str:
    keep = peaks(scores_row[None], thresh)[0]
    return "".join(OCR_CLASS_NAMES[int(c)]
                   for c, k in zip(cls_row, keep) if k)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m yolo_tpu.tools.ocr_operating_point")
    p.add_argument("--lp", required=True)
    p.add_argument("--ocr", required=True)
    p.add_argument("--lp-spec", default="lp_v2")
    p.add_argument("--ocr-spec", default="ocr_v1")
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=99,
                   help="99 = the high-n cascade eval distribution")
    p.add_argument("--thresholds", default="0.4,0.45,0.5,0.55,0.6,0.65,0.7")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    lp_task = make_task("lp", builtin_spec(args.lp_spec))
    ocr_task = make_task("ocr", builtin_spec(args.ocr_spec))
    lp_vars, lp_step = load_variables(lp_task, args.lp)
    ocr_vars, _ = load_variables(ocr_task, args.ocr)

    h, w = lp_task.spec.size
    renderer = LPRenderer(h, w)
    pipe = ALPRPipeline(lp_task, ocr_task, warp_impl="matmul")
    r_max = tuple(lp_task.spec.LP_r_max)
    batch = args.batch

    # same scene construction as evaluate.eval_cascade (seed included),
    # but the OCR head's raw maps come back whole: sigmoid scores and the
    # per-column argmax class for EVERY column, not just >0.6 peaks
    @jax.jit
    def run_known(lp_variables, ocr_variables, key):
        k1, k2, k3, _ = jax.random.split(key, 4)
        bg = procedural_backgrounds(k1, batch, h, w)
        chars = renderer.sample_chars(k2, batch)
        inks = renderer.draw_plates(chars)
        poses = jax.vmap(lambda k: renderer.sample_pose(k, r_max))(
            jax.random.split(k3, batch))
        rgb, alpha, centre = jax.vmap(renderer._project_one)(inks, poses)
        imgs = jnp.clip(bg * (1 - alpha) + rgb * alpha, 0, 1)

        lp_map = lp_task.apply_eval(lp_variables, imgs)
        from yolo_tpu.decode import decode_lp
        lp_pred = decode_lp(lp_map.astype(jnp.float32),
                            lp_task.spec.LP_r_max)
        corners, crops = pipe._unwarp_batch(imgs, lp_pred, (h, w))
        score_x, class_x = ocr_task.apply_eval(ocr_variables, crops)
        B = score_x.shape[0]
        s = sigmoid(score_x.astype(jnp.float32).reshape(B, -1))
        cls = jnp.argmax(class_x.astype(jnp.float32)
                         .reshape(B, s.shape[1], -1), -1)
        return chars, poses, corners, s, cls

    proj = PlateProjector()
    threshes = [float(t) for t in args.thresholds.split(",")]
    hits = {t: 0 for t in threshes}
    chars_ok = {t: 0 for t in threshes}
    chars_total = 0
    total = 0
    # diagnosis at the reference's 0.6 default
    n_len_err = 0          # wrong number of peaks
    n_subst = 0            # right length, >=1 wrong class
    iou_pass, iou_fail = [], []

    key = jax.random.PRNGKey(args.seed)
    for b in range(args.batches):
        key, k = jax.random.split(key)
        chars, poses, corners, s, cls = run_known(lp_vars, ocr_vars, k)
        chars = np.asarray(chars)
        poses = np.asarray(poses)
        corners = np.asarray(corners)
        s = np.asarray(s)
        cls = np.asarray(cls)
        for i in range(batch):
            truth = "".join(CLASS_NAMES[int(c)] for c in chars[i])
            total += 1
            chars_total += len(truth)
            for t in threshes:
                pred = text_at(s[i], cls[i], t)
                hits[t] += int(pred == truth)
                n = min(len(pred), len(truth))
                chars_ok[t] += sum(a == c for a, c in
                                   zip(pred[:n], truth[:n]))
            pred6 = text_at(s[i], cls[i], 0.6)
            tc = np.asarray(proj.corners_in_image(
                jnp.asarray(poses[i]), (h, w)))
            ciou = _corner_iou(tc, corners[i])
            if pred6 == truth:
                iou_pass.append(ciou)
            else:
                iou_fail.append(ciou)
                if len(pred6) != len(truth):
                    n_len_err += 1
                else:
                    n_subst += 1

    sweep = {f"{t:g}": {"exact": hits[t] / total,
                        "char": chars_ok[t] / chars_total}
             for t in threshes}
    best_t = max(threshes, key=lambda t: hits[t])
    out = {
        "samples": total,
        "sweep": sweep,
        "best_threshold": best_t,
        "best_exact": hits[best_t] / total,
        "default_exact": hits[0.6] / total if 0.6 in hits else None,
        "failures_at_0.6": len(iou_fail),
        "failures_peak_count": n_len_err,
        "failures_substitution": n_subst,
        "corner_iou_passed": float(np.mean(iou_pass)) if iou_pass else None,
        "corner_iou_failed": float(np.mean(iou_fail)) if iou_fail else None,
        "lpd_step": lp_step,
        "lp": args.lp, "ocr": args.ocr,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
