"""End-to-end fused-cascade accuracy evaluation CLI.

Measures the full serving path — LPD pose -> perspective unwarp with the
PREDICTED pose -> OCR string — against rendered ground truth
(tools.evaluate.eval_cascade). The reference never quantified this chain;
its halves lived in two ROS nodes (licence_plate/LPD_video_node.py ->
OCR/OCR.py video mode).

    python -m yolo_tpu.tools.cascade_eval \
        --lp runs/lp_v2/backup --ocr trained/ocr_v1_cascade \
        --batches 8 --out eval_cascade.json
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


from yolo_tpu.config import builtin_spec
from yolo_tpu.tools.evaluate import eval_cascade, eval_lpd
from yolo_tpu.train import make_task
from yolo_tpu.train.checkpoint import restore_tree



def load_variables(task, path: str):
    """Restore either a full TrainState backup or a params-only snapshot.
    Template-free (restore_tree), so it works regardless of the optimizer
    the run used."""
    tree = restore_tree(path)
    step = int(jnp.asarray(tree.get("step", 0)).item()) \
        if "step" in tree else 0
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}
    return variables, step


def main(argv=None):
    p = argparse.ArgumentParser(prog="python -m yolo_tpu.tools.cascade_eval")
    p.add_argument("--lp", required=True, help="LPD checkpoint dir")
    p.add_argument("--ocr", required=True, help="OCR checkpoint dir")
    p.add_argument("--lp-spec", default="lp_v2")
    p.add_argument("--ocr-spec", default="ocr_v1")
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--with-lpd", action="store_true",
                   help="also report standalone LPD pose metrics")
    p.add_argument("--sample-hw", default=None,
                   help="unwarp sampling resolution 'HxW' (pipeline "
                        "default when unset)")
    p.add_argument("--warp-impl", default="matmul",
                   choices=["gather", "matmul"])
    p.add_argument("--decode-impl", default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--out", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    lp_task = make_task("lp", builtin_spec(args.lp_spec))
    ocr_task = make_task("ocr", builtin_spec(args.ocr_spec))
    lp_vars, lp_step = load_variables(lp_task, args.lp)
    ocr_vars, _ = load_variables(ocr_task, args.ocr)

    pipe_kw = {"warp_impl": args.warp_impl, "decode_impl": args.decode_impl}
    if args.sample_hw:
        h, w = args.sample_hw.lower().split("x")
        pipe_kw["unwarp_sample_hw"] = (int(h), int(w))
    m = eval_cascade(lp_task, lp_vars, ocr_task, ocr_vars,
                     batches=args.batches, batch=args.batch, **pipe_kw)
    m.update({k: str(v) for k, v in pipe_kw.items()})
    if args.with_lpd:
        m.update(eval_lpd(lp_task, lp_vars, batches=args.batches,
                          batch=args.batch,
                          r_max=tuple(lp_task.spec.LP_r_max)))
    m["lpd_step"] = lp_step
    out = json.dumps(m)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return m


if __name__ == "__main__":
    main()
