"""Regression tests for the fail-loud queue step runner.

scripts/run_step.py is what stands between a wedged-TPU queue step and a
zero-byte "evidence" artifact (round-2 weak #2) or a queue stalled hours
past its timeout (round-3 post-mortem: a child blocked in the axon claim
leg produces NO output, so a read-loop-based deadline never fires).
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

RUN_STEP = str(Path(__file__).resolve().parent.parent / "scripts" /
               "run_step.py")


def _run(tmp_path, *argv, timeout=120):
    """Invoke run_step.py with cwd=tmp_path (it writes reports/logs/)."""
    return subprocess.run([sys.executable, RUN_STEP, *argv],
                          cwd=tmp_path, capture_output=True, text=True,
                          timeout=timeout)


def test_silent_hang_killed_at_deadline(tmp_path):
    """A child that blocks forever with NO output (the wedged-claim mode)
    must be killed at --timeout, not whenever it next prints."""
    t0 = time.time()
    r = _run(tmp_path, "--name", "hang", "--timeout", "3",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, "-c", "import time; time.sleep(600)")
    elapsed = time.time() - t0
    assert r.returncode == 1
    assert "FAILED" in r.stdout
    assert elapsed < 30, f"deadline did not fire: {elapsed:.0f}s"
    assert not (tmp_path / "out.json").exists()


def test_last_line_artifact_written(tmp_path):
    r = _run(tmp_path, "--name", "ok", "--timeout", "60",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, "-c",
             "print('noise'); print('{\"value\": 7}')")
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads((tmp_path / "out.json").read_text()) == {"value": 7}
    # the child's stdout landed in the log
    assert "noise" in (tmp_path / "reports/logs/ok.log").read_text()


def test_failed_child_writes_no_artifact(tmp_path):
    r = _run(tmp_path, "--name", "boom", "--timeout", "60",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, "-c",
             "print('{\"value\": 7}'); raise SystemExit(3)")
    assert r.returncode == 1
    assert not (tmp_path / "out.json").exists()
    assert "rc: 3" in (tmp_path / "reports/logs/boom.log").read_text()


def test_allow_fail_is_loud_but_nonfatal(tmp_path):
    r = _run(tmp_path, "--name", "soft", "--timeout", "60",
             "--allow-fail", "--",
             sys.executable, "-c", "raise SystemExit(2)")
    assert r.returncode == 0
    assert "FAILED" in r.stdout


def test_check_rejects_empty_artifact(tmp_path):
    art = tmp_path / "self.json"
    r = _run(tmp_path, "--name", "chk", "--timeout", "60",
             "--artifact", str(art), "--check", "--",
             sys.executable, "-c", f"open({str(art)!r}, 'w').close()")
    assert r.returncode == 1
    assert "missing/empty/invalid" in r.stdout


def test_check_accepts_valid_artifact(tmp_path):
    art = tmp_path / "self.json"
    r = _run(tmp_path, "--name", "chk2", "--timeout", "60",
             "--artifact", str(art), "--check", "--",
             sys.executable, "-c",
             f"import json; json.dump({{'a': 1}}, open({str(art)!r}, 'w'))")
    assert r.returncode == 0, r.stdout + r.stderr


def test_grandchild_holding_pipe_killed_at_deadline(tmp_path):
    """The deadline must kill the whole process GROUP: a grandchild that
    inherits the stdout pipe (watchdog_train's trainer) would otherwise
    keep the read loop blocked long after the direct child died."""
    t0 = time.time()
    r = _run(tmp_path, "--name", "grand", "--timeout", "3", "--",
             "bash", "-c", "(sleep 300; echo late) & sleep 300")
    elapsed = time.time() - t0
    assert r.returncode == 1
    assert "FAILED" in r.stdout
    assert elapsed < 30, f"group kill did not fire: {elapsed:.0f}s"


def test_check_failure_quarantines_stale_artifact(tmp_path):
    """A failed --check step must not leave the PREVIOUS run's artifact
    in place for the end-of-queue manifest to validate as fresh."""
    art = tmp_path / "self.json"
    art.write_text('{"stale": true}')
    r = _run(tmp_path, "--name", "stale", "--timeout", "60",
             "--artifact", str(art), "--check", "--",
             sys.executable, "-c", "raise SystemExit(1)")
    assert r.returncode == 1
    assert not art.exists()
    assert json.loads((tmp_path / "self.json.prev").read_text()) == \
        {"stale": True}


def test_last_line_failure_quarantines_stale_artifact(tmp_path):
    """--last-line steps get the same stale-artifact quarantine: a
    crashed re-run must not leave round-N-1 evidence in place."""
    art = tmp_path / "out.json"
    art.write_text('{"stale": true}')
    r = _run(tmp_path, "--name", "stale2", "--timeout", "60",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, "-c", "raise SystemExit(1)")
    assert r.returncode == 1
    assert not art.exists()
    assert (tmp_path / "out.json.prev").exists()


def test_retries_recovers_after_transient_failure(tmp_path):
    """--retries 1 re-runs a failed attempt (round-4 post-mortem: three
    cold-compile timeouts would have been saved by one warm retry). The
    child fails on its first run, then succeeds via a marker file."""
    script = tmp_path / "flaky.py"
    script.write_text(
        "import os, sys\n"
        "m = 'marker.tmp'\n"
        "if not os.path.exists(m):\n"
        "    open(m, 'w').close()\n"
        "    sys.exit(3)\n"
        "print('{\"ok\": 1}')\n")
    r = _run(tmp_path, "--name", "flaky", "--retries", "1",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, str(script))
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads((tmp_path / "out.json").read_text()) == {"ok": 1}
    assert "attempt 0 FAILED" in r.stdout
    assert "attempt 1" in r.stdout


def test_retries_exhausted_still_fails_loud(tmp_path):
    r = _run(tmp_path, "--name", "dead", "--retries", "1",
             "--artifact", "out.json", "--last-line", "--",
             sys.executable, "-c", "raise SystemExit(4)")
    assert r.returncode == 1
    assert not (tmp_path / "out.json").exists()
    assert "2 attempt(s)" in r.stdout
