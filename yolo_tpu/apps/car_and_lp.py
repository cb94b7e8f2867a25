"""Joint car + licence-plate app.

Reference twin: car_and_LP/YOLO.py (CarLPNet trained on both tasks;
the video mode is the full VOR + ALPR cascade that the reference spread
over carLP_video_node.py + OCR/OCR.py ROS processes).
"""
from __future__ import annotations

from yolo_tpu.apps import common, runner

MODES = ["train", "render_and_train", "valid", "eval", "export", "video"]


def main(argv=None):
    args = common.make_parser("python -m yolo_tpu.apps.car_and_lp",
                              MODES).parse_args(argv)
    common.check_mode(args, MODES)
    spec = common.resolve_spec(args.version, "carlp_v1")
    if args.mode in ("train", "render_and_train"):
        runner.run_train("carlp", spec, args)
    elif args.mode == "valid":
        runner.run_valid("carlp", spec, args)
    elif args.mode == "eval":
        runner.run_eval("carlp", spec, args)
    elif args.mode == "export":
        runner.run_export("carlp", spec, args)
    elif args.mode == "video":
        runner.run_video("carlp", spec, args)


if __name__ == "__main__":
    main()
