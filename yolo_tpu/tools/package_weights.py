"""Package a training run's weights as a params-only snapshot.

Takes the latest full TrainState checkpoint from a run's backup dir and
writes a compact {params, batch_stats} orbax snapshot (step 0) under
``trained/<name>`` — the distribution format the apps' ``--weight`` flag
and bench.py restore.

    python -m yolo_tpu.tools.package_weights \
        --src runs/lp_v2/backup --dst trained/lp_v2
"""
from __future__ import annotations

import argparse
import json
import os
import shutil

from yolo_tpu.train.checkpoint import restore_tree, save_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="run backup dir")
    p.add_argument("--dst", required=True, help="snapshot dir (trained/..)")
    p.add_argument("--force", action="store_true",
                   help="replace an existing snapshot")
    args = p.parse_args(argv)

    tree = restore_tree(args.src)
    step = int(tree.get("step", 0))
    snapshot = {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}
    if args.force:
        shutil.rmtree(args.dst, ignore_errors=True)
    save_checkpoint(args.dst, snapshot, step=0, keep=1)
    # ship the run's spec next to the weights: anchors/sizes are part of
    # the artifact — decoding refit-anchor weights with a builtin spec
    # produces wrong boxes (the reference's export bundles spec.yaml too,
    # /root/reference/car/YOLO.py export path)
    spec_src = os.path.join(os.path.dirname(args.src.rstrip("/")),
                            "spec.yaml")
    spec_copied = False
    if os.path.isfile(spec_src):
        shutil.copy(spec_src, os.path.join(args.dst, "spec.yaml"))
        spec_copied = True
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "source_step": step, "spec_copied": spec_copied}))


if __name__ == "__main__":
    main()
