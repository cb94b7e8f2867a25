"""Device mesh + sharding helpers: the framework's entire scale-out layer.

The reference scaled by hand: slicing the batch per GPU, per-device
forward/backward in a python loop, kvstore gradient allreduce
(yolo_modules/yolo_gluon.py:100-124, car/YOLO.py:373-396). On TPU all of
that collapses into sharding annotations: the batch axis is sharded over
the mesh's ``data`` axis, parameters are replicated, and XLA emits the
gradient psum over ICI. BatchNorm statistics are computed over the global
batch under jit — i.e. the SyncBatchNorm the reference plumbed but had to
disable (basic_yolo.py:8,26; car/YOLO.py:94-95) falls out for free.

A ``model`` axis is reserved in the mesh signature for tensor-parallel
sharding of future large heads; at these model sizes it stays size 1.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """1-D (data) mesh by default; pass axis_names=('data', 'model') with a
    factorisable device count for a 2-D mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        shape = (n, 1)
    else:
        raise ValueError("at most 2 mesh axes supported")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of batched arrays with the batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), tree)
