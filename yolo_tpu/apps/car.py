"""Vehicle-orientation (VOR) detection app.

Reference twin: car/YOLO.py (YOLOv3 multi-scale for v1-v4, DenseNet
single-scale for v11; modes train/render_and_train/valid/export/kmean/
valid_Nima/valid_Nima_plot/video). ``render_and_train`` is an alias of
``train`` here — synthesis is fused into the train step, so there is no
separate threaded variant to choose.
"""
from __future__ import annotations

from yolo_tpu.apps import common, runner

MODES = ["train", "render_and_train", "valid", "eval", "export",
         "kmean", "valid_nima", "valid_nima_plot", "video"]


def pick_kind(version: str) -> str:
    # reference: v11 is the DenseNet single-scale variant (car/YOLO.py:35-40)
    return "car_dense" if "11" in version else "car"


def main(argv=None):
    args = common.make_parser("python -m yolo_tpu.apps.car",
                              MODES).parse_args(argv)
    common.check_mode(args, MODES)
    default = "car_v11" if "11" in args.version else "car_v1"
    spec = common.resolve_spec(args.version, default)
    kind = pick_kind(args.version)
    if args.mode in ("train", "render_and_train"):
        runner.run_train(kind, spec, args)
    elif args.mode == "valid":
        runner.run_valid(kind, spec, args)
    elif args.mode == "eval":
        runner.run_eval(kind, spec, args)
    elif args.mode == "export":
        runner.run_export(kind, spec, args)
    elif args.mode == "kmean":
        runner.run_kmean(spec, args)
    elif args.mode == "video":
        runner.run_video(kind, spec, args)
    elif args.mode in ("valid_nima", "valid_nima_plot"):
        from yolo_tpu.tools.freiburg import run_valid_nima, run_valid_nima_plot
        if args.mode == "valid_nima":
            run_valid_nima(kind, spec, args)
        else:
            run_valid_nima_plot(args)


if __name__ == "__main__":
    main()
