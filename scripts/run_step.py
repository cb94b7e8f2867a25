#!/usr/bin/env python
"""Fail-loud queue step runner.

Round-2 post-mortem: queued TPU evals crashed, their stderr went to
/dev/null, and `| tail -1 > report.json` committed zero-byte artifacts
nobody noticed. This runner makes that impossible:

* the child's stdout+stderr always land in reports/logs/<name>.log;
* a non-zero exit writes NO artifact and exits non-zero itself;
* with --last-line the artifact is the last stdout line, which must
  parse as JSON (anything else = step failure);
* with --check the artifact must exist, be non-empty and parse as JSON
  after the command ran (for tools that write their own --out file);
* --allow-fail marks steps whose failure shouldn't abort a queue; the
  failure is still logged loudly and no artifact is produced;
* --retries N re-runs a failed attempt up to N more times. Round-4
  post-mortem: three evidence runs died at cold-compile timeouts on a
  fresh VM; with the persistent XLA cache the retry recompiles from
  cache in seconds, so one retry converts those into artifacts.

Usage:
  python scripts/run_step.py --name car_eval --timeout 900 --retries 1 \
      --artifact reports/eval_car_final.json --last-line -- \
      python -m yolo_tpu.apps.car trained/car_v1 eval
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time


def run_attempt(cmd: list[str], log_path: str, timeout: float,
                attempt: int) -> tuple[int, list[str], float]:
    """One supervised child run. Returns (rc, stdout lines, elapsed)."""
    t0 = time.time()
    out_lines: list[str] = []
    rc: int
    mode = "w" if attempt == 0 else "a"
    with open(log_path, mode) as log:
        log.write(f"# cmd: {' '.join(cmd)}\n# start: {time.ctime()}"
                  f"  attempt: {attempt}\n")
        log.flush()
        try:
            # start_new_session: the deadline must kill the WHOLE process
            # group — watchdog_train's trainer child inherits our stdout
            # pipe, and killing only the direct child leaves the orphaned
            # grandchild holding the pipe open, blocking the read loop
            # until IT exits (reproduced: a wedged trainer defeated the
            # 900 s deadline by 40 min)
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True,
                                    start_new_session=True)
            # hard deadline on a timer thread: a child that blocks with NO
            # output (the wedged-TPU-claim failure mode) would otherwise
            # hang the `for line in stdout` loop forever
            timed_out = threading.Event()

            def _kill_group():
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass

            def _kill_on_deadline():
                if proc.poll() is None:
                    timed_out.set()
                    _kill_group()

            killer = threading.Timer(timeout, _kill_on_deadline)
            killer.daemon = True
            killer.start()
            assert proc.stdout is not None
            for line in proc.stdout:
                log.write(line)
                log.flush()
                out_lines.append(line.rstrip("\n"))
            rc = proc.wait(timeout=60)
            killer.cancel()
            if timed_out.is_set():
                log.write(f"\n# runner: killed at {timeout:.0f}s timeout\n")
                rc = -9
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                pass
            rc = -9
        except Exception as e:  # noqa: BLE001 — a runner must not crash
            log.write(f"\n# runner exception: {e!r}\n")
            rc = -1
        dt = time.time() - t0
        log.write(f"# rc: {rc}  elapsed: {dt:.1f}s\n")
    return rc, out_lines, dt


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--artifact", default=None)
    p.add_argument("--last-line", action="store_true",
                   help="artifact = last stdout line (validated JSON)")
    p.add_argument("--check", action="store_true",
                   help="command writes the artifact itself; verify it")
    p.add_argument("--timeout", type=float, default=1800.0)
    p.add_argument("--retries", type=int, default=0,
                   help="re-run a failed attempt up to N more times "
                        "(cold-compile timeouts retry warm from the "
                        "persistent XLA cache)")
    p.add_argument("--allow-fail", action="store_true")
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        print(f"[run_step:{args.name}] ERROR: empty command", file=sys.stderr)
        return 2

    os.makedirs("reports/logs", exist_ok=True)
    log_path = f"reports/logs/{args.name}.log"
    if args.artifact and os.path.exists(args.artifact):
        # quarantine the previous run's artifact (both --check and
        # --last-line): a step that fails must not let the old file pass
        # the end-of-queue manifest as this run's evidence
        os.replace(args.artifact, args.artifact + ".prev")

    rc, out_lines, dt = -1, [], 0.0
    for attempt in range(args.retries + 1):
        print(f"[run_step:{args.name}] RUN (attempt {attempt}) "
              f"{' '.join(cmd)}", flush=True)
        rc, out_lines, dt = run_attempt(cmd, log_path, args.timeout, attempt)
        if rc == 0:
            break
        tail = "\n".join(out_lines[-15:])
        print(f"[run_step:{args.name}] attempt {attempt} FAILED rc={rc} "
              f"after {dt:.1f}s. Log tail:\n{tail}", flush=True)

    if rc != 0:
        print(f"[run_step:{args.name}] FAILED rc={rc} after "
              f"{args.retries + 1} attempt(s) — NO artifact written.",
              flush=True)
        return 0 if args.allow_fail else 1

    if args.artifact and args.last_line:
        last_json = None
        for line in reversed(out_lines):
            line = line.strip()
            if line.startswith("{"):
                try:
                    last_json = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if last_json is None:
            print(f"[run_step:{args.name}] FAILED: no JSON line in stdout — "
                  f"NO artifact written (see {log_path})", flush=True)
            return 0 if args.allow_fail else 1
        tmp = args.artifact + ".tmp"
        with open(tmp, "w") as f:
            json.dump(last_json, f)
            f.write("\n")
        os.replace(tmp, args.artifact)
    elif args.artifact and args.check:
        ok = False
        try:
            with open(args.artifact) as f:
                json.load(f)
            ok = os.path.getsize(args.artifact) > 0
        except Exception:
            ok = False
        if not ok:
            print(f"[run_step:{args.name}] FAILED: artifact "
                  f"{args.artifact} missing/empty/invalid", flush=True)
            return 0 if args.allow_fail else 1

    print(f"[run_step:{args.name}] OK ({dt:.1f}s)"
          + (f" -> {args.artifact}" if args.artifact else ""), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
