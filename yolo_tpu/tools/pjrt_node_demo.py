"""End-to-end drive of the fully native serving node (native/pjrt_node).

Exports a small closed-over model to raw StableHLO, renders frames with
the on-device plate renderer, writes them as the raw RGB stream the
framepipe ring consumes, launches the C++ node as a subprocess against a
PJRT plugin, and checks its detections against the jax outputs.

    python -m yolo_tpu.tools.pjrt_node_demo \
        --plugin /opt/axon/libaxon_pjrt.so [--out reports/pjrt_node.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.serve.export import export_stablehlo
from yolo_tpu.serve.native import _NATIVE_DIR, axon_create_options_env


def main(argv=None):
    # pin THIS process to CPU: if the demo's own jax touched the TPU it
    # would hold the device claim and the C++ child would deadlock
    # waiting for it. Export cross-lowers for TPU from the CPU process.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default=os.environ.get(
        "YOLO_TPU_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so"))
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    binary = os.path.join(_NATIVE_DIR, "pjrt_node")
    if not os.path.exists(binary):
        subprocess.run(["make", "-C", _NATIVE_DIR, "pjrt_node"], check=True)

    fh = fw = 96                      # producer frame geometry
    nh, nw = 128, 128                 # network canvas (letterboxed)
    B = args.batch

    # small conv detector head: frames -> (B, 8) feature summary
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 3, 8), jnp.float32) * 0.1

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(jax.nn.leaky_relu(y, 0.1), axis=(1, 2))

    frames_u8 = (np.random.default_rng(1)
                 .random((args.frames, fh, fw, 3)) * 255).astype(np.uint8)

    with tempfile.TemporaryDirectory() as td:
        module = os.path.join(td, "module.mlir")
        export_stablehlo(
            fn, (jnp.zeros((B, nh, nw, 3), jnp.float32),), module,
            platforms=["tpu"])
        raw = os.path.join(td, "frames.raw")
        with open(raw, "wb") as f:
            f.write(frames_u8.tobytes())

        env = dict(os.environ)
        env.setdefault("PJRT_CREATE_OPTIONS",
                       axon_create_options_env(args.plugin))
        r = subprocess.run(
            [binary, args.plugin, module, str(fh), str(fw), str(nh),
             str(nw), str(B), raw],
            capture_output=True, text=True, timeout=560, env=env)
        print(r.stdout)
        if r.returncode != 0:
            print(r.stderr)
            raise SystemExit(r.returncode)

    summary = json.loads(r.stdout.strip().splitlines()[-1])
    summary["ok"] = summary["frames"] >= args.frames
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
