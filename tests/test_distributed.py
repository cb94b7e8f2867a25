"""Multi-process (DCN) scale-out tests.

SURVEY §2.4: the multi-host path was designed (jax.distributed +
global mesh + sharded step) but never executed with >1 process until
this test — two local processes, each with 2 virtual CPU devices,
join a coordinator on localhost and run one sharded train step through
``runner.build_trainer``'s multi-host branch. Both must report the
same loss (replicated state, global-batch gradient all-reduce).
"""
import os
import re
import socket
import subprocess
import sys

import pytest

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_train_step(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))] +
        env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"DCN_OK {i} devices=4" in out, out[-2000:]
    # identical replicated loss on both hosts
    losses = [re.search(r"loss=([0-9.]+)", o).group(1) for o in outs]
    assert losses[0] == losses[1], losses
