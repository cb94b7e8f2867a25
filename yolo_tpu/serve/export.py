"""Deployment export: checkpoint -> portable compiled artifact.

The reference exported hybridized MXNet symbol+params and optionally ONNX
(yolo_gluon.export, yolo_modules/yolo_gluon.py:245-272), consumed by
simple_bind executors or TensorRT engines. The TPU-native equivalent is
``jax.export``: the jitted inference function is lowered to versioned
StableHLO bytes plus an orbax params checkpoint — loadable in any
process (including a C++ PJRT client) without the model-building code.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Tuple

import jax

from yolo_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


def export_model(fn: Callable, example_args: Tuple, variables: Any,
                 export_dir: str, meta: dict = None):
    """Serialize ``jit(fn)(variables, *example_args)`` to
    ``export_dir/model.stablehlo`` + params checkpoint + meta.json.

    ``fn(variables, *args)`` must be jittable with static shapes.
    """
    os.makedirs(export_dir, exist_ok=True)
    exported = jax.export.export(jax.jit(fn))(variables, *example_args)
    blob = exported.serialize()
    with open(os.path.join(export_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    save_checkpoint(os.path.join(export_dir, "params"), variables, step=0)
    # closed-over raw StableHLO twin for the native PJRT shim (weights as
    # constants, data-only signature — the TRT-engine role)
    export_stablehlo(lambda *a: fn(variables, *a), example_args,
                     os.path.join(export_dir, "module_pjrt.mlir"))
    info = {"in_avals": [str(a) for a in exported.in_avals],
            "out_avals": [str(a) for a in exported.out_avals],
            "platforms": list(exported.platforms)}
    info.update(meta or {})
    with open(os.path.join(export_dir, "meta.json"), "w") as f:
        json.dump(info, f, indent=2)
    return exported


def export_stablehlo(fn: Callable, example_args: Tuple, path: str,
                     platforms=None) -> bytes:
    """Lower ``jit(fn)(*example_args)`` to RAW portable StableHLO bytecode
    (no jax calling-convention wrapper) — the artifact a PJRT C API client
    compiles directly (native/pjrt_shim.cpp). Close parameters over in
    ``fn`` so the module's signature is data-only, like a TensorRT engine.
    """
    exported = jax.export.export(jax.jit(fn), platforms=platforms)(
        *example_args)
    blob = exported.mlir_module_serialized
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def load_exported(export_dir: str, variables_template: Any = None):
    """Rehydrate (callable, variables) from an export directory.

    The callable is the deserialized StableHLO program; call it as
    ``fn(variables, *args)`` exactly like the original.
    """
    with open(os.path.join(export_dir, "model.stablehlo"), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    variables = None
    params_dir = os.path.join(export_dir, "params")
    if variables_template is not None and os.path.isdir(params_dir):
        variables = restore_checkpoint(params_dir, variables_template)
    return exported.call, variables
