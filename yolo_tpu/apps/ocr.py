"""Plate OCR app.

Reference twin: OCR/OCR.py (module-level train/valid/export/video over a
DenseNet column classifier). ``video`` consumes plate strips — from a
directory/video of crops, or synthetic — and prints validated plate
strings (the reference subscribed to /YOLO/clipped_LP for the same).
"""
from __future__ import annotations

import jax
import numpy as np

from yolo_tpu.apps import common, runner

MODES = ["train", "valid", "eval", "export", "video"]


def main(argv=None):
    args = common.make_parser("python -m yolo_tpu.apps.ocr",
                              MODES).parse_args(argv)
    common.check_mode(args, MODES)
    spec = common.resolve_spec(args.version, "ocr_v1")
    if args.mode == "train":
        runner.run_train("ocr", spec, args)
    elif args.mode == "valid":
        runner.run_valid("ocr", spec, args)
    elif args.mode == "eval":
        runner.run_eval("ocr", spec, args)
    elif args.mode == "export":
        runner.run_export("ocr", spec, args)
    elif args.mode == "video":
        run_ocr_video(spec, args)


def run_ocr_video(spec, args):
    """Stream plate strips through the OCR net + peak decode."""
    import jax.numpy as jnp
    from yolo_tpu.decode import decode_ocr, is_valid_taiwan_plate, \
        peaks_to_text
    from yolo_tpu.serve.video import FrameSource, VideoNode
    trainer = runner.build_trainer("ocr", spec, args)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    task = trainer.task

    def infer(frames):
        score_x, class_x = task.apply_eval(variables, frames)
        return decode_ocr(jnp.asarray(score_x, jnp.float32),
                          jnp.asarray(class_x, jnp.float32))
    fn = jax.jit(infer)

    def sink(idx, result, frames):
        text = peaks_to_text(np.asarray(result.peak_cls[0]))
        ok = is_valid_taiwan_plate(text)
        print(f"[OCR] {text or '(none)'}{' VALID' if ok else ''}")

    source = FrameSource(args.dev, tuple(spec.size),
                         clip=(args.clip_h, args.clip_w), flip=args.flip,
                         max_frames=getattr(args, "max_frames", 32))
    node = VideoNode(fn, batch=1, sinks=[sink])
    print(node.run(source))


if __name__ == "__main__":
    main()
