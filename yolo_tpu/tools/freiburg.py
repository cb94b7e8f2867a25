"""Freiburg static-cars-52 benchmark harness ("valid_Nima").

Reference: car/YOLO.py:684-838 — evaluates the VOR model against the
published annotations of the Freiburg multi-view car dataset (tab-
separated lines ``<img>\\t<l u r d>\\t<azi>``), writing per-image IoU +
azimuth-error records and summary statistics/plots. Same file contract
here: point ``--freiburg`` (or $YOLO_TPU_FREIBURG) at a directory with
``annotations/<i>_annot.txt`` plus the frames; results land under
``<root>/result_<version>/``.
"""
from __future__ import annotations

import math
import os
from typing import List, Optional

import numpy as np

FREIBURG_ENV = "YOLO_TPU_FREIBURG"
IMAGE_W, IMAGE_H = 960.0, 540.0
SKIP_CARS = (0, 6, 20, 23, 31, 36)    # cars the reference excludes


def _freiburg_root(args) -> Optional[str]:
    root = getattr(args, "freiburg", None) or os.environ.get(FREIBURG_ENV)
    return root if root and os.path.isdir(root) else None


def run_valid_nima(kind: str, spec, args):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from yolo_tpu.apps.runner import build_trainer
    from yolo_tpu.decode import decode_car
    from yolo_tpu.ops.boxes import make_grid_tables
    from yolo_tpu.utils.viz import RadarProb

    root = _freiburg_root(args)
    if root is None:
        print("freiburg dataset not found (set $YOLO_TPU_FREIBURG); "
              "nothing to evaluate")
        return None

    trainer = build_trainer(kind, spec, args)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    task = trainer.task

    # weights are jit ARGUMENTS, not closure constants: constant-folded
    # params blow the serialized module past the axon remote-compile
    # transport limit (HTTP 413) and disable donation
    @jax.jit
    def infer(v, img):
        out = task.apply_eval(v, img)
        if kind == "carlp":
            out = out[0]
        out = [o.astype(jnp.float32) for o in out]
        return decode_car(out, grids, spec.slice_point, spec.size)

    radar = RadarProb(spec.num_class, spec.classes)
    result_dir = os.path.join(root, f"result_{args.version}", "annotations")
    os.makedirs(result_dir, exist_ok=True)
    h, w = spec.size

    for car_i in range(53):
        if car_i in SKIP_CARS:
            continue
        txt = os.path.join(root, "annotations", f"{car_i}_annot.txt")
        if not os.path.exists(txt):
            continue
        out_lines: List[str] = []
        with open(txt) as f:
            lines = f.readlines()
        for line in lines:
            parts = line.rstrip("\n").split("\t")
            img_name = parts[0].split(".")[0] + ".png"
            img_path = os.path.join(root, img_name)
            if not os.path.exists(img_path):
                continue
            im = Image.open(img_path).convert("RGB").resize((w, h))
            x = jnp.asarray(np.asarray(im, np.float32) / 255.0)[None]
            pred = np.asarray(infer(variables, x))[0]

            left_ = (pred[2] - 0.5 * pred[4]) * IMAGE_W
            up_ = (pred[1] - 0.5 * pred[3]) * IMAGE_H
            right_ = (pred[2] + 0.5 * pred[4]) * IMAGE_W
            down_ = (pred[1] + 0.5 * pred[3]) * IMAGE_H

            vec_ang, vec_rad, _ = radar.cls2ang(
                float(pred[0]), pred[-spec.num_class:])

            left, up, right, down = np.asarray(
                parts[1].split(), dtype=np.float32)
            azi_label = int(parts[2]) - 90
            azi_label = azi_label - 360 if azi_label > 180 else azi_label

            # clamp each overlap to 0: two negative extents would
            # otherwise multiply into a POSITIVE intersection and score
            # a completely missed detection as a hit
            inter = max(0.0, min(right, right_) - max(left, left_)) * \
                max(0.0, min(down, down_) - max(up, up_))
            a1 = (right - left) * (down - up)
            a2 = (right_ - left_) * (down_ - up_)
            iou = inter / (a1 + a2 - inter) if (a1 + a2 - inter) else 0.0
            out_lines.append("%s %f %f %f %f\n" % (
                img_name, iou, azi_label,
                vec_ang * 180 / math.pi, vec_rad))
        with open(os.path.join(result_dir, f"{car_i}_annot"), "w") as f:
            f.writelines(out_lines)
        print(f"car {car_i}: {len(out_lines)} frames evaluated")
    return result_dir


def run_valid_nima_plot(args, filter_index=(14, 17)):
    """Summarise per-car IoU + azimuth RMSE from valid_nima outputs
    (reference car/YOLO.py:778-838)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    root = _freiburg_root(args)
    if root is None:
        print("freiburg dataset not found; nothing to plot")
        return None
    path = os.path.join(root, f"result_{args.version}", "annotations")
    plot_path = os.path.join(path, "plot")
    os.makedirs(plot_path, exist_ok=True)

    all_iou, all_azi = [], []
    for annot in sorted(os.listdir(path)):
        if annot == "plot":
            continue
        num = annot.split("_")[0]
        if int(num) in filter_index:
            continue
        ious, errs, x1s, x2s = [], [], [], []
        with open(os.path.join(path, annot)) as f:
            for line in f:
                cols = line.split(" ")
                iou = float(cols[1])
                if iou < 0.5:
                    continue
                ious.append(iou)
                x1, x2 = float(cols[2]), float(cols[3])
                x1s.append(x1)
                x2s.append(x2)
                err = x1 - x2
                err += 360 if err < -180 else (-360 if err > 180 else 0)
                errs.append(err ** 2)
        if not ious:
            continue
        fig = plt.figure()
        ax = fig.add_subplot(111)
        ax.plot(x1s, "go-")
        ax.plot(x2s, "ro-")
        fig.savefig(os.path.join(plot_path, num + ".png"))
        plt.close(fig)
        all_iou.append(sum(ious) / len(ious))
        all_azi.append(math.sqrt(sum(errs) / len(errs)))
        print(f"car {num}: iou {all_iou[-1]:.4f}, "
              f"azi RMSE {all_azi[-1]:.2f}°")
    if all_iou:
        print(f"mean IoU: {sum(all_iou)/len(all_iou):.4f}")
        print(f"mean azimuth RMSE: {sum(all_azi)/len(all_azi):.2f}°")
    return all_iou, all_azi
