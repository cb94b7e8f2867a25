#!/usr/bin/env python3
"""Training watchdog for the single-chip transport.

The remote-device transport can stall mid-run (client blocks forever on
a dead connection; metrics stop advancing with ~0 CPU). This wrapper
launches a training command, watches its metrics file's mtime, and on a
stall kills + relaunches the command — the Trainer auto-resumes from the
run's latest checkpoint, so at most ``record_step`` steps are repeated.

    python scripts/watchdog_train.py \
        --metrics runs/car_v1/logs/metrics.jsonl \
        --stale 420 --grace 900 --max-restarts 8 \
        -- python -m yolo_tpu.apps.car runs/car_v1 train --steps 14000 --bf16 1
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def mtime(path: str) -> float:
    """mtime of a NON-EMPTY metrics file (0 otherwise).

    MetricWriter creates the jsonl at Trainer init, long before the
    first jitted step finishes compiling; an existence-based check
    would flip the watchdog from the compile grace window to the short
    stale limit and kill every launch mid-compile."""
    try:
        if os.path.getsize(path) == 0:
            return 0.0
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--metrics", required=True)
    p.add_argument("--stale", type=float, default=420.0,
                   help="seconds without a metrics write = stall")
    p.add_argument("--grace", type=float, default=900.0,
                   help="startup grace (compile + restore) per launch")
    p.add_argument("--max-restarts", type=int, default=8)
    p.add_argument("--claim-wait", type=float, default=150.0,
                   help="wait after a kill for the device claim handover")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- training command")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given")

    restarts = 0
    while True:
        launch_t = time.time()
        print(f"[watchdog] launch (attempt {restarts + 1}): "
              f"{' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd)
        try:
            while True:
                rc = proc.poll()
                if rc is not None:
                    print(f"[watchdog] exited rc={rc}", flush=True)
                    if rc == 0 or restarts >= args.max_restarts:
                        return rc
                    break               # crashed -> restart
                m = mtime(args.metrics)
                ref = max(m, launch_t)
                limit = args.stale if m > launch_t else args.grace
                if time.time() - ref > limit:
                    print(f"[watchdog] STALL: no metrics write for "
                          f"{time.time() - ref:.0f}s — killing",
                          flush=True)
                    proc.send_signal(signal.SIGTERM)
                    try:
                        proc.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        proc.kill()
                        proc.wait()
                    break
                time.sleep(15)
        except KeyboardInterrupt:
            proc.terminate()
            return 130
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] giving up", flush=True)
            return 1
        print(f"[watchdog] waiting {args.claim_wait:.0f}s for the device "
              f"claim to release", flush=True)
        time.sleep(args.claim_wait)


if __name__ == "__main__":
    sys.exit(main())
