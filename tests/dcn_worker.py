"""Worker process for the 2-process DCN (jax.distributed) test.

Each worker contributes 2 virtual CPU devices; the pair forms a
4-device global mesh over the distributed control plane and runs ONE
sharded train step through the real runner.build_trainer multi-host
branch (apps/runner.py:27-58). Usage:

    python tests/dcn_worker.py <process_id> <num_processes> <port> <dir>
"""
import os
import sys
from types import SimpleNamespace

proc_id, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2"
                           ).strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from yolo_tpu.apps import runner  # noqa: E402
from yolo_tpu.config import builtin_spec  # noqa: E402

spec = builtin_spec("car_v1").replace(
    size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
    channels=[4, 8, 8, 16, 16, 32, 32], batch_size=8,
    record_step=0, valid_step=0)

args = SimpleNamespace(version=os.path.join(workdir, f"p{proc_id}"),
                       weight=None, bf16=0, batch=0, record=0,
                       backgrounds=None, car_assets=None)
trainer = runner.build_trainer("car", spec, args)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 2, len(jax.devices())
assert trainer.mesh.devices.size == nproc * 2

step = trainer.make_step()
key = jax.random.PRNGKey(0)
kb, ks = jax.random.split(key)
bg = trainer.next_backgrounds(kb)
state, losses = step(trainer.state, ks, bg)
total = float(losses["total"])
assert total > 0.0
print(f"DCN_OK {proc_id} devices={len(jax.devices())} "
      f"loss={total:.6f}", flush=True)
