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


def flatten_weights(variables: Any):
    """Flatten a variables pytree into ONE flat f32 array + the recipe
    to rebuild it inside a traced function.

    A 500-argument executable exhausts the TPU's sync-flag (sflag)
    memory — one copy-start per argument — while a single packed tensor
    costs one. The reshape slices are static, so XLA turns them into
    views. Returns ``(flat, unflatten)`` where ``unflatten(flat_w)``
    rebuilds the pytree from a traced flat argument.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(variables)
    shapes = [tuple(np.shape(l)) for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    offsets = np.cumsum([0] + sizes).tolist()
    flat = np.concatenate(
        [np.asarray(l, np.float32).ravel() for l in leaves])

    def unflatten(flat_w):
        leaf_args = [
            flat_w[offsets[i]:offsets[i + 1]].reshape(shapes[i])
            for i in range(len(shapes))]
        return jax.tree_util.tree_unflatten(treedef, leaf_args)

    return flat, unflatten


def write_weights_bin(leaves, path: str) -> int:
    """Serialize pytree leaves in tree_leaves order for pjrt_node.

    Format (native/pjrt_node.cpp upload_weights): "YTW1", int32
    n_tensors, then per tensor int32 ndims, int64 dims[ndims], int32
    dtype (0=f32), raw bytes.
    """
    import struct

    import numpy as np

    with open(path, "wb") as f:
        f.write(b"YTW1")
        f.write(struct.pack("<i", len(leaves)))
        for leaf in leaves:
            a = np.ascontiguousarray(np.asarray(leaf, np.float32))
            f.write(struct.pack("<i", a.ndim))
            for d in a.shape:
                f.write(struct.pack("<q", d))
            f.write(struct.pack("<i", 0))
            f.write(a.tobytes())
    return len(leaves)


def make_serving_fn(pipe, unflatten, u8_hw=None, nv12: bool = False):
    """``fn(frames, flat_w) -> (packed,)`` for the native PJRT node:
    the fused cascade with the PACKED single-output head
    (pipeline.packed_call — no crops over the transport) and, with
    ``u8_hw=(fh, fw)``, raw uint8 ingestion whose on-device letterbox +
    /255 bit-matches framepipe's fp_ring_pop_batch (4x less H2D than
    f32 batches).

    ``nv12=True`` (requires ``u8_hw``): frames arrive as packed NV12 —
    the native wire format of camera stacks — and the BT.601 conversion
    runs on device (ops.image.nv12_to_rgb). 1.5 bytes/px instead of 3:
    on the bandwidth-bound serving transport this doubles the
    frame-rate ceiling. WIRE SHAPE: the NV12 bytes ride as a rank-4
    (B, fh//2, fw, 3) u8 tensor — the same linear bytes as the packed
    (B, fh*3//2, fw) planes (C-order reshape). Image-shaped rank-4
    keeps the native node's ring/pop/dims path byte-for-byte identical
    to the proven u8-RGB mode (one ring slot of height fh/2 IS one
    NV12 frame)."""
    import jax.numpy as jnp

    from yolo_tpu.ops.image import nv12_to_rgb

    nh, nw = pipe.spec.size

    def fn(frames, flat_w):
        if u8_hw is not None:
            fh, fw = u8_hw
            dy, dx = (nh - fh) // 2, (nw - fw) // 2
            if nv12:
                x = nv12_to_rgb(
                    frames.reshape(frames.shape[0], fh * 3 // 2, fw),
                    (fh, fw))
            else:
                x = frames.astype(jnp.float32) / 255.0
            frames = jnp.pad(
                x, ((0, 0), (dy, nh - fh - dy), (dx, nw - fw - dx),
                    (0, 0)), constant_values=0.5)
        jv, ov = unflatten(flat_w)
        return (pipe.packed_call(jv, ov, frames),)

    return fn


def export_serving(pipe, joint_variables, ocr_variables, export_dir: str,
                   batch: int, frame_hw=(416, 416), u8: bool = True,
                   nv12: bool = False, platforms=("tpu",)):
    """One-call native serving artifact: everything pjrt_node consumes.

    Writes ``module_pjrt.mlir`` (raw StableHLO, data-only signature:
    (B, fh, fw, 3) u8 frames + one flat f32 weights arg -> one packed
    (B, K) f32 output), ``weights.bin`` (YTW1), and ``meta.json`` with
    the packed column spans + stream geometry. The TensorRT-engine role
    (SURVEY §2.3 tensorrt_ros; reference tensorrt_module.py) with the
    verification story the reference never had (tools.pjrt_node_demo).
    """
    import jax.numpy as jnp
    import numpy as np

    os.makedirs(export_dir, exist_ok=True)
    if nv12 and not u8:
        raise ValueError("nv12 ingestion requires u8=True")
    flat, unflatten = flatten_weights((joint_variables, ocr_variables))
    fh, fw = frame_hw
    fn = make_serving_fn(pipe, unflatten, u8_hw=(fh, fw) if u8 else None,
                         nv12=nv12)
    if nv12:
        in_shape = (batch, fh // 2, fw, 3)
    elif u8:
        in_shape = (batch, fh, fw, 3)
    else:
        in_shape = (batch,) + tuple(pipe.spec.size) + (3,)
    in_spec = jax.ShapeDtypeStruct(
        in_shape, jnp.uint8 if u8 else jnp.float32)
    flat_spec = jax.ShapeDtypeStruct(np.shape(flat), np.float32)
    module_path = os.path.join(export_dir, "module_pjrt.mlir")
    export_stablehlo(fn, (in_spec, flat_spec), module_path,
                     platforms=list(platforms))
    weights_path = os.path.join(export_dir, "weights.bin")
    write_weights_bin([flat], weights_path)
    meta = {"batch": batch, "frame_hw": [fh, fw],
            "net_hw": list(pipe.spec.size),
            "input": "nv12" if nv12 else ("u8" if u8 else "f32"),
            "packed_sections": pipe.packed_sections(),
            "warp_impl": pipe.warp_impl, "topk": pipe.topk}
    with open(os.path.join(export_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return {"module": module_path, "weights": weights_path, "meta": meta}


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
