"""Shared CLI plumbing for the task apps.

Keeps the reference's invocation contract — positional ``version`` and
``mode``, per-version ``<version>/spec.yaml`` (falling back to the
packaged parity specs), ``--weight``/``--record`` train flags and the
video-node flags (yolo_cv.add_video_parser, car/utils.py:12-45) — minus
the ``exec``-string dispatch and GPU index plumbing (device selection is
jax's job on TPU).
"""
from __future__ import annotations

import argparse
import os
from typing import List

from yolo_tpu.config import Spec, builtin_spec, load_spec


def make_parser(prog: str, modes: List[str]) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog)
    p.add_argument("version", help="version directory (vN) or builtin spec name")
    p.add_argument("mode", help="one of: " + "/".join(modes))

    # ---- train/valid ----
    p.add_argument("--ocr-weight", dest="ocr_weight", default=None,
                   help="OCR checkpoint for the cascade export/video "
                        "paths (default: newest packaged trained/ocr_*)")
    p.add_argument("--weight", default=None,
                   help="checkpoint directory to restore (default: "
                        "<version>/backup latest)")
    p.add_argument("--record", type=int, default=1,
                   help="write metrics/checkpoints")
    p.add_argument("--steps", type=int, default=0,
                   help="training steps to run from here (0 = until "
                        "interrupted)")
    p.add_argument("--until-step", dest="until_step", type=int, default=0,
                   help="train up to this TOTAL step count (restart-safe: "
                        "resuming runs only the remainder)")
    p.add_argument("--batch", type=int, default=0,
                   help="override spec batch size")
    p.add_argument("--bf16", type=int, default=0,
                   help="bfloat16 activations")
    p.add_argument("--backgrounds", default=os.environ.get(
        "YOLO_TPU_BACKGROUNDS", None),
        help="directory of background images (SUN2012-style); "
             "procedural fallback if unset")
    p.add_argument("--car-assets", dest="car_assets",
                   default=os.environ.get("YOLO_TPU_CAR_ASSETS", None),
                   help="directory of azi/ele-named transparent car PNGs")

    # ---- video (reference add_video_parser contract) ----
    p.add_argument("--topic", default="/usb_cam/image_raw",
                   help="ROS topic to subscribe (video mode with --dev ros)")
    p.add_argument("--dev", default="synthetic",
                   help="'ros' | video path | camera index | 'synthetic'")
    p.add_argument("--flip", type=int, default=3,
                   help="1 left-right, 0 top-down, -1 both, else none")
    p.add_argument("--clip_h", type=float, default=1.0)
    p.add_argument("--clip_w", type=float, default=1.0)
    p.add_argument("--show", type=int, default=0,
                   help="display/save processed frames")
    p.add_argument("--radar", type=int, default=0,
                   help="plot the viewpoint distribution radar")
    p.add_argument("--max-frames", dest="max_frames", type=int, default=64,
                   help="frame budget for video mode (0 = unbounded)")
    p.add_argument("--devices", type=int, default=1,
                   help="video mode: shard the stream batch over this many "
                        "devices (ShardedVideoNode)")
    p.add_argument("--freiburg", default=None,
                   help="Freiburg static-cars dataset root (valid_nima)")
    p.add_argument("--topk", type=int, default=0,
                   help="car eval/video: decode up to K objects via "
                        "top-k NMS instead of the single argmax box "
                        "(eval additionally renders multi-car scenes)")
    p.add_argument("--score-thresh", type=float, default=0.5,
                   help="multi-object eval: detection score cut")
    p.add_argument("--nms-iou", type=float, default=0.45,
                   help="multi-object eval: NMS IoU suppression threshold")
    p.add_argument("--num-obj", type=int, default=0,
                   help="multi-object eval: cars rendered per scene "
                        "(0 = max(spec max_objects, 2))")
    p.add_argument("--cascade", type=int, default=0,
                   help="carlp eval: measure the FULL fused serving path "
                        "(JointPipeline -> predicted-pose unwarp -> OCR "
                        "text) instead of the pose heads alone")
    return p


def resolve_spec(version: str, default_builtin: str) -> Spec:
    """<version>/spec.yaml if present, else the packaged spec."""
    path = os.path.join(version, "spec.yaml")
    if os.path.exists(path):
        return load_spec(path)
    try:
        return builtin_spec(default_builtin if version.startswith("v")
                            and not os.path.isdir(version)
                            else version)
    except Exception:
        return builtin_spec(default_builtin)


def check_mode(args, modes: List[str]):
    if args.mode not in modes:
        raise SystemExit(f"available modes are {modes}")
