"""Round-trip proof for the native PJRT serving shim.

Python export -> C++ PJRT execute -> outputs compared against the jax
originals. This is the native deployment contract (SURVEY §2.3: the
tensorrt_ros replacement): the C++ side (native/pjrt_shim.cpp) never
imports Python — it dlopens a PJRT plugin, compiles the StableHLO module
written by serve.export.export_stablehlo and runs raw host arrays.

    python -m yolo_tpu.tools.pjrt_roundtrip \
        --plugin /opt/axon/libaxon_pjrt.so [--full]

Default is a small conv net (fast on any backend); --full runs the fused
joint LPD+VOR+OCR pipeline at a reduced operating point.
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.serve.export import export_stablehlo
from yolo_tpu.serve.native import PjrtEngine


def small_model():
    """A conv+BN+LeakyReLU-shaped function with a matmul tail."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 3, 16), jnp.float32) * 0.1
    b = jnp.linspace(-1, 1, 16, dtype=jnp.float32)

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.leaky_relu(y + b, 0.1)
        return jnp.mean(y, axis=(1, 2)), jnp.max(y)

    args = (jax.random.uniform(key, (2, 32, 48, 3), jnp.float32),)
    return fn, args


def full_pipeline():
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train import make_task

    spec = builtin_spec("carlp_v1").replace(
        size=[192, 192], layers=[1, 1, 2, 2, 2, 1],
        channels=[8, 16, 16, 32, 32, 64, 64])
    ocr_spec = builtin_spec("ocr_v1").replace(
        num_init_features=16, growth_rate=8, block_config=[2, 2, 2])
    joint_task = make_task("carlp", spec)
    ocr_task = make_task("ocr", ocr_spec)
    key = jax.random.PRNGKey(0)
    jv = joint_task.init_variables(key)
    ov = ocr_task.init_variables(key)
    pipe = JointPipeline(joint_task, ocr_task, unwarp_sample_hw=(64, 160))

    def fn(frames):
        # dense head maps first (strict comparison), then the fused
        # pipeline's decoded outputs. The decoded ones are argmax-cell
        # derived: under random-init weights the score map is near-flat
        # and two independent compiles of the same program may pick
        # different tied cells, so they are reported but not gated on —
        # the trained-weight node demo (pjrt_node_demo --model carlp)
        # compares them strictly on confident rendered scenes.
        car_out, lp_map = joint_task.apply_eval(jv, frames)
        r = pipe(jv, ov, frames)
        return (*car_out, lp_map, r.car, r.corners, r.ocr_scores)

    args = (jax.random.uniform(key, (4, 192, 192, 3), jnp.float32),)
    n_strict = len(spec.all_anchors) + 1
    return fn, args, n_strict


def main(argv=None):
    # pin THIS process's jax to CPU: a jax TPU client would hold the
    # device claim for process lifetime and PjrtEngine's own client on
    # the same plugin would block forever in PJRT_Client_Create (the
    # documented axon claim behaviour; pjrt_node_demo has the same
    # guard). The module is cross-lowered for the plugin's platform.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass    # backend already initialized (e.g. under pytest)
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default=os.environ.get(
        "YOLO_TPU_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so"))
    p.add_argument("--full", action="store_true")
    p.add_argument("--platform", default=None,
                   help="lowering platform for the exported module "
                        "(default: tpu for the axon plugin, else cpu)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    platform = args.platform or (
        "tpu" if "axon" in args.plugin or "tpu" in args.plugin else "cpu")

    if args.full:
        fn, example_args, n_strict = full_pipeline()
    else:
        fn, example_args = small_model()
        n_strict = None    # every output gates ok

    # jax reference values (on whatever backend this process uses)
    ref = jax.jit(fn)(*example_args)
    ref = [np.asarray(r, np.float32) for r in jax.tree_util.tree_leaves(ref)]

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "module.mlir")
        export_stablehlo(fn, example_args, path, platforms=[platform])
        engine = PjrtEngine(args.plugin, module_path=path)
        outs = engine(*[np.asarray(a) for a in example_args])
        engine.close()

    assert len(outs) == len(ref), (len(outs), len(ref))
    errs = []
    for got, want in zip(outs, ref):
        got = np.asarray(got, np.float32).reshape(want.shape)
        denom = max(1e-6, float(np.abs(want).max()))
        errs.append(float(np.abs(got - want).max()) / denom)
    gated = errs if n_strict is None else errs[:n_strict]
    result = {
        "plugin": args.plugin,
        "mode": "full_pipeline" if args.full else "small_model",
        "n_outputs": len(outs),
        "n_strict": len(gated),
        "max_rel_err": max(gated),
        "per_output_rel_err": errs,
        "ok": bool(max(gated) < 5e-2),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
