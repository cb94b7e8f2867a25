"""Licence-plate 6-DoF pose detection app.

Reference twin: licence_plate/LP_detection.py (DenseNet pose detector,
modes train/valid/export/video). ``video`` runs the fused
LPD -> unwarp -> OCR cascade (the reference needed two ROS nodes for it).
"""
from __future__ import annotations

from yolo_tpu.apps import common, runner

MODES = ["train", "valid", "eval", "export", "video"]


def main(argv=None):
    args = common.make_parser("python -m yolo_tpu.apps.lp_detection",
                              MODES).parse_args(argv)
    common.check_mode(args, MODES)
    spec = common.resolve_spec(args.version, "lp_v2")
    if args.mode == "train":
        runner.run_train("lp", spec, args)
    elif args.mode == "valid":
        runner.run_valid("lp", spec, args)
    elif args.mode == "eval":
        runner.run_eval("lp", spec, args)
    elif args.mode == "export":
        runner.run_export("lp", spec, args)
    elif args.mode == "video":
        runner.run_video("lp", spec, args)


if __name__ == "__main__":
    main()
