"""Real-image transfer evaluation for the trained ALPR cascade.

The reference's evidence of real-world operation was demo video
(README.md:12-31) plus one bundled real plate photograph,
licence_plate/test.jpg ("ABC-5678") — the only real (non-synthetic,
non-font-derived) plate imagery in the repo, and this environment has no
network egress to fetch more. This tool measures how the synthetic-
trained models transfer to that real asset, three ways:

1. **Direct OCR read**: the photo resized to the 160x384 OCR strip ->
   trained OCR -> decoded string (the reference's OCR video node did
   exactly this with rectified crops, OCR/OCR.py:134-142,180-201).
2. **Full cascade on real-plate scenes**: the REAL plate pixels (not the
   training fonts) are perspective-projected into 320x512 scenes at
   sampled 6-DoF poses — the same camera model the detector was trained
   under — then pushed through the fused LPD -> predicted-pose unwarp ->
   OCR program. Real glyph shapes/shadows/bolts on top of novel poses:
   a genuine appearance-domain shift with controlled geometry, so pose
   error IS measurable (we know where we placed the plate).
3. **Photometric stress**: the same scenes under brightness shift, blur
   and sensor noise.

Usage:
    python -m yolo_tpu.tools.real_image \
        --lp trained/lp_v2 --ocr trained/ocr_v2 \
        --out reports/real_image.json --save-dir reports/real_image
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import builtin_spec
from yolo_tpu.decode import peaks_to_text
from yolo_tpu.ops.geometry import (PlateProjector, homography_from_4pts,
                                   warp_perspective)
from yolo_tpu.pipeline import ALPRPipeline
from yolo_tpu.render import procedural_backgrounds
from yolo_tpu.tools.cascade_eval import load_variables
from yolo_tpu.train import make_task

REF_TEST_JPG = "/root/reference/licence_plate/test.jpg"
TRUTH = {os.path.abspath(REF_TEST_JPG): "ABC5678"}   # dash is not a class


def load_image(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def composite_plate(plate, bg, pose, projector: PlateProjector):
    """Project REAL plate pixels into a scene at a 6-DoF pose.

    The scene->plate homography comes from the same 4-corner projection
    the renderer/labels use (PlateProjector corner order [RB, LB, LT,
    RT], geometry.py:54-116), so the placed pose is exact ground truth.
    """
    H, W = plate.shape[:2]
    hw = bg.shape[:2]
    corners = projector.corners_in_image(pose, hw)          # (4, 2) px
    src = jnp.asarray([[W, H], [0., H], [0., 0.], [W, 0.]], jnp.float32)
    Hmat = homography_from_4pts(corners, src)               # canvas->plate
    rgba = jnp.concatenate(
        [jnp.asarray(plate), jnp.ones((H, W, 1), jnp.float32)], -1)
    warped = warp_perspective(rgba, Hmat, hw, fill=0.0)
    a = warped[..., 3:4]
    return bg * (1.0 - a) + warped[..., :3] * a, corners


def corner_iou(tc: np.ndarray, pc: np.ndarray) -> float:
    def bbox(c):
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
    tl, tt, tr, tb = bbox(tc)
    pl, pt, pr, pb = bbox(pc)
    iw = max(0.0, min(tr, pr) - max(tl, pl))
    ih = max(0.0, min(tb, pb) - max(tt, pt))
    inter = iw * ih
    union = ((tr - tl) * (tb - tt) + (pr - pl) * (pb - pt) - inter)
    return float(inter / max(union, 1e-9))


def save_png(path: str, img: np.ndarray):
    from PIL import Image
    Image.fromarray(np.clip(np.asarray(img) * 255, 0, 255)
                    .astype(np.uint8)).save(path)


def draw_quad(img: np.ndarray, corners: np.ndarray, color):
    """Rasterize the quad outline into the image (host-side, reports only)."""
    out = np.array(img)
    h, w = out.shape[:2]
    for i in range(4):
        x0, y0 = corners[i]
        x1, y1 = corners[(i + 1) % 4]
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.clip(np.linspace(x0, x1, n).astype(int), 0, w - 1)
        ys = np.clip(np.linspace(y0, y1, n).astype(int), 0, h - 1)
        for dy in (-1, 0, 1):
            out[np.clip(ys + dy, 0, h - 1), xs] = color
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="python -m yolo_tpu.tools.real_image")
    p.add_argument("--images", nargs="*", default=[REF_TEST_JPG])
    p.add_argument("--lp", default="trained/lp_v2")
    p.add_argument("--ocr", default="trained/ocr_v2")
    p.add_argument("--lp-spec", default="lp_v2")
    p.add_argument("--ocr-spec", default="ocr_v1")
    p.add_argument("--scenes", type=int, default=32,
                   help="composited scenes per image")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", default=None)
    p.add_argument("--save-dir", default=None,
                   help="write annotated PNGs here")
    args = p.parse_args(argv)

    lp_task = make_task("lp", builtin_spec(args.lp_spec))
    ocr_task = make_task("ocr", builtin_spec(args.ocr_spec))
    lp_vars, _ = load_variables(lp_task, args.lp)
    ocr_vars, _ = load_variables(ocr_task, args.ocr)
    h, w = lp_task.spec.size
    pipe = ALPRPipeline(lp_task, ocr_task)
    run_pipe = pipe.jit()
    projector = PlateProjector()

    # direct OCR on a resized strip (jit once, reuse across images)
    @jax.jit
    def ocr_direct(strip):
        score_x, class_x = ocr_task.apply_eval(ocr_vars, strip[None])
        from yolo_tpu.decode import decode_ocr
        o = decode_ocr(score_x.astype(jnp.float32),
                       class_x.astype(jnp.float32))
        return o.peak_cls[0]

    # pose sampler matching the training distribution's ranges
    # (render/lp.py sample_pose; Z in [1500, 5000] mm, X,Y proportional
    # to Z so the plate stays in frame, rotations within LP_r_max)
    r_max = np.radians(lp_task.spec.LP_r_max)
    rng = np.random.default_rng(args.seed)

    def sample_pose():
        Z = rng.uniform(1800.0, 4200.0)
        X = rng.uniform(-0.16, 0.16) * Z
        Y = rng.uniform(-0.12, 0.12) * Z
        r = rng.uniform(-0.55, 0.55, 3) * r_max
        return np.asarray([X, Y, Z, *r], np.float32)

    def stress(img, kind, k):
        if kind == "bright":
            return np.clip(img * 1.35 + 0.06, 0, 1)
        if kind == "dark":
            return np.clip(img * 0.6, 0, 1)
        if kind == "noise":
            return np.clip(
                img + rng.normal(0, 0.03, img.shape).astype(np.float32),
                0, 1)
        if kind == "blur":
            out = jnp.asarray(img)
            kern = jnp.ones((3, 3), jnp.float32) / 9.0
            out = jax.vmap(
                lambda c: jax.scipy.signal.convolve2d(c, kern, mode="same"),
                in_axes=2, out_axes=2)(out)
            return np.asarray(out)
        return img

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    report = {"lp": args.lp, "ocr": args.ocr, "warp_impl": pipe.warp_impl,
              "images": []}
    for path in args.images:
        plate = load_image(path)
        truth = TRUTH.get(os.path.abspath(path))
        entry = {"path": path, "truth": truth}

        # --- 1. direct OCR read -----------------------------------------
        strip = jax.image.resize(jnp.asarray(plate), (160, 384, 3),
                                 "bilinear")
        direct = peaks_to_text(np.asarray(ocr_direct(strip)))
        entry["direct_ocr"] = direct
        entry["direct_ocr_exact"] = (direct == truth) if truth else None

        # --- 2. cascade on composited real-plate scenes ------------------
        keys = jax.random.split(jax.random.PRNGKey(args.seed), 4)
        scenes, gt_corners, poses = [], [], []
        bgs = np.asarray(procedural_backgrounds(keys[0], args.scenes, h, w))
        for i in range(args.scenes):
            pose = sample_pose()
            img, corners = composite_plate(plate, jnp.asarray(bgs[i]),
                                           jnp.asarray(pose), projector)
            scenes.append(np.asarray(img))
            gt_corners.append(np.asarray(corners))
            poses.append(pose)
        batch = jnp.asarray(np.stack(scenes))
        res = run_pipe(lp_vars, ocr_vars, batch)
        lp_pred = np.asarray(res.lp)
        pred_corners = np.asarray(res.corners)
        peak_cls = np.asarray(res.ocr_cls)

        per_scene, exact, ious, z_errs = [], 0, [], []
        for i in range(args.scenes):
            text = peaks_to_text(peak_cls[i])
            iou = corner_iou(gt_corners[i], pred_corners[i])
            z_err = abs(float(lp_pred[i, 3]) - float(poses[i][2]))
            ok = (text == truth) if truth else None
            exact += int(bool(ok))
            ious.append(iou)
            z_errs.append(z_err)
            per_scene.append({
                "pose": [round(float(v), 2) for v in poses[i]],
                "pred_pose": [round(float(v), 3) for v in lp_pred[i]],
                "ocr": text, "ok": ok, "corner_iou": round(iou, 4),
                "z_err_mm": round(z_err, 1)})
        entry["cascade"] = {
            "scenes": args.scenes,
            "exact_match": exact / args.scenes,
            "mean_corner_iou": float(np.mean(ious)),
            "z_mae_mm": float(np.mean(z_errs)),
            "per_scene": per_scene}

        # --- 3. photometric stress (first 8 scenes per kind) --------------
        entry["stress"] = {}
        nstress = min(8, args.scenes)
        for kind in ("bright", "dark", "noise", "blur"):
            imgs = np.stack([stress(scenes[i], kind, i)
                             for i in range(nstress)])
            # pad to the compiled batch to reuse the same executable
            pad = np.repeat(imgs[:1], args.scenes - nstress, 0)
            r = run_pipe(lp_vars, ocr_vars,
                         jnp.asarray(np.concatenate([imgs, pad])))
            cls_np = np.asarray(r.ocr_cls)[:nstress]
            pc = np.asarray(r.corners)[:nstress]
            texts = [peaks_to_text(cls_np[i]) for i in range(nstress)]
            entry["stress"][kind] = {
                "exact": (sum(t == truth for t in texts) / nstress
                          if truth else None),
                "mean_corner_iou": float(np.mean(
                    [corner_iou(gt_corners[i], pc[i])
                     for i in range(nstress)]))}

        if args.save_dir:
            stem = os.path.splitext(os.path.basename(path))[0]
            for i in range(min(4, args.scenes)):
                img = draw_quad(scenes[i], gt_corners[i], (0.0, 1.0, 0.0))
                img = draw_quad(img, pred_corners[i], (1.0, 0.2, 0.2))
                save_png(os.path.join(
                    args.save_dir,
                    f"{stem}_scene{i}_{per_scene[i]['ocr']}.png"), img)
                save_png(os.path.join(args.save_dir,
                                      f"{stem}_crop{i}.png"),
                         np.asarray(res.crops[i]))
            save_png(os.path.join(args.save_dir, f"{stem}_strip.png"),
                     np.asarray(strip))

        report["images"].append(entry)

    # headline rollup over all images with known truth
    known = [e for e in report["images"] if e["truth"]]
    if known:
        report["bundled_image_direct_ok"] = all(
            e["direct_ocr_exact"] for e in known)
        report["cascade_exact_mean"] = float(np.mean(
            [e["cascade"]["exact_match"] for e in known]))
    out = json.dumps(report, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "images"}))
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return report


if __name__ == "__main__":
    main()
