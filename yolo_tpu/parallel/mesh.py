"""Device mesh + sharding helpers: the framework's entire scale-out layer.

The reference scaled by hand: slicing the batch per GPU, per-device
forward/backward in a python loop, kvstore gradient allreduce
(yolo_modules/yolo_gluon.py:100-124, car/YOLO.py:373-396). On TPU all of
that collapses into sharding annotations: the batch axis is sharded over
the mesh's ``data`` axis, parameters are replicated, and XLA emits the
gradient psum over ICI. BatchNorm statistics are computed over the global
batch under jit — i.e. the SyncBatchNorm the reference plumbed but had to
disable (basic_yolo.py:8,26; car/YOLO.py:94-95) falls out for free.

Tensor parallelism is the same idea applied to the channel axis: with a
2-D ``(data, model)`` mesh, :func:`state_sharding_tree` shards the
output-channel dim of every wide conv kernel (and its adam moments) over
``model``; GSPMD propagates the activation shardings and inserts the
all-gathers/reduce-scatters over ICI. At the flagship's sizes TP is not
needed for capacity — it exists so the scale-out layer is complete
(SURVEY §2.4 row "TP") and is exercised by tests and the driver dryrun.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None, model_size: int = 1) -> Mesh:
    """1-D (data) mesh by default; pass axis_names=('data', 'model') and
    ``model_size=k`` for a 2-D (n/k, k) data x model mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        if n % model_size:
            raise ValueError(f"{n} devices not divisible by "
                             f"model_size={model_size}")
        shape = (n // model_size, model_size)
    else:
        raise ValueError("at most 2 mesh axes supported")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def model_axis_size(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of batched arrays with the batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), tree)


def state_sharding_tree(mesh: Mesh, tree, min_features: int = 256):
    """Tensor-parallel NamedShardings for a params / train-state pytree.

    Every 4-D conv kernel (HWIO) whose output-channel dim is divisible
    by the mesh's ``model`` axis and at least ``min_features`` wide is
    sharded over that dim — the adam moments mirror the param shapes so
    the same leaf rule shards them identically. Everything else (BN
    vectors, narrow kernels, scalars) is replicated; GSPMD reshards at
    use sites. With no ``model`` axis (or size 1) this degrades to
    fully-replicated, i.e. plain DP.
    """
    msize = model_axis_size(mesh)
    tp = NamedSharding(mesh, P(None, None, None, "model"))
    repl = NamedSharding(mesh, P())

    def rule(x):
        shape = getattr(x, "shape", ())
        if (msize > 1 and len(shape) == 4 and shape[-1] >= min_features
                and shape[-1] % msize == 0):
            return tp
        return repl

    return jax.tree_util.tree_map(rule, tree)
