"""Benchmark the fused Pallas conv3x3+BN+LeakyReLU against XLA on the
shapes the flagship network actually runs.

Shapes = the stride-1 residual 3x3 convs of CarLPNet at the 448x448
bench operating point (channels double per stage,
yolo_tpu/configs/carlp_v1.yaml layers/channels). Prints a markdown table
+ one JSON line. Run on the real TPU with nothing else using the chip.

    python -m yolo_tpu.tools.bench_conv_kernel [--batch 16] [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


SHAPES = [
    # (H, W, Cin, Cout) — residual-block 3x3 convs at 448 input
    (112, 112, 32, 64),
    (56, 56, 64, 128),
    (28, 28, 128, 256),
    (14, 14, 256, 512),
    (7, 7, 512, 1024),
]

# The trained parity operating point (320x512 — car/v1/spec.yaml size)
# runs non-square maps; --shapes 320x512 benches these instead.
SHAPES_320x512 = [
    (160, 256, 32, 64),
    (80, 128, 64, 128),
    (40, 64, 128, 256),
    (20, 32, 256, 512),
    (10, 16, 512, 1024),
]


def timeit(fn, args, iters):
    r = fn(*args)
    float(jnp.asarray(r, jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.asarray(r, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    from yolo_tpu.pallas.conv_kernel import (conv3x3_bn_leaky_xla,
                                             fused_conv3x3_bn_leaky)
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--shapes", default="448",
                   choices=["448", "320x512"],
                   help="square 448-input stages or the non-square "
                        "320x512 parity operating point")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    shapes = SHAPES if args.shapes == "448" else SHAPES_320x512
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    backend = jax.default_backend()
    key = jax.random.PRNGKey(0)
    rows = []
    print(f"| H x W x Cin -> Cout (B={args.batch}, {args.dtype}, "
          f"{backend}) | XLA ms | Pallas ms | speedup |")
    print("|---|---|---|---|")
    for (H, W, Cin, Cout) in shapes:
        x = jax.random.normal(key, (args.batch, H, W, Cin), dtype)
        w = (jax.random.normal(key, (3, 3, Cin, Cout), jnp.float32)
             * 0.05)
        scale = jnp.linspace(0.5, 1.5, Cout)
        bias = jnp.linspace(-1.0, 1.0, Cout)

        # weights as jit args (closure constants inflate the serialized
        # module past the remote-compile transport limit)
        f_x = jax.jit(conv3x3_bn_leaky_xla)
        f_p = jax.jit(fused_conv3x3_bn_leaky)
        ref = jnp.asarray(f_x(x, w, scale, bias), jnp.float32)
        got = jnp.asarray(f_p(x, w, scale, bias), jnp.float32)
        err = float(jnp.max(jnp.abs(ref - got)))
        ms_x = timeit(f_x, (x, w, scale, bias), args.iters)
        ms_p = timeit(f_p, (x, w, scale, bias), args.iters)
        rows.append({"shape": [H, W, Cin, Cout], "xla_ms": ms_x,
                     "pallas_ms": ms_p, "max_abs_err": err})
        print(f"| {H}x{W}x{Cin}->{Cout} | {ms_x:.3f} | {ms_p:.3f} | "
              f"{ms_x / ms_p:.2f}x |")

    line = {"backend": backend, "batch": args.batch, "dtype": args.dtype,
            "shapes": args.shapes, "rows": rows}
    print(json.dumps(line))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(line, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
