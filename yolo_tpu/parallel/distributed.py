"""Multi-host scale-out helpers.

One chip trains every model in this repo, but the framework is built for
slices: this module wraps ``jax.distributed`` (the DCN control plane) and
builds meshes spanning all hosts' devices. The data-parallel train step in
``train.trainer`` is topology-agnostic — the same sharded jit runs on a
multi-host mesh unchanged, with XLA routing the gradient all-reduce over
ICI within a slice and DCN across slices.

The reference has no multi-node story at all (single node, manual GPU
splits, kvstore); this is the designed-in replacement.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from yolo_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise the multi-host runtime. No-ops (returns False) when
    running single-process with no coordinator configured, so every entry
    point can call it unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def global_mesh(axis_names: Sequence[str] = ("data",)):
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(axis_names=axis_names, devices=jax.devices())


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a host-built global batch this process owns when
    feeding per-host shards (jax.make_array_from_process_local_data)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
