"""Per-stage timing of the fused serving pipeline on the current backend.

Answers "where does the millisecond go" for the headline bench
configuration (JointPipeline at 448x448, batch 64, bf16): times the
joint network forward alone, +decode (xla vs pallas), +unwarp (gather vs
matmul, at both sampling resolutions), and the full cascade with OCR.
Prints one markdown table + a JSON line; optionally writes a
jax.profiler trace.

Timing method (axon transport): dispatch N iterations, read one scalar
from the LAST result — the device executes FIFO so the readback is a
barrier over all N (see .claude/skills/verify/SKILL.md).

    python -m yolo_tpu.tools.profile_pipeline [--batch 64] [--iters 30]
        [--trace DIR]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, args, iters: int, probe) -> float:
    """ms per iteration; ``probe(result) -> scalar array`` for the
    readback barrier."""
    r = fn(*args)
    float(probe(r))              # compile + warmup barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(probe(r))
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--trace", default=None,
                   help="write a jax.profiler trace of the full pipeline")
    p.add_argument("--trunk", action="store_true",
                   help="decompose the joint FORWARD instead: per-stage "
                        "backbone prefixes + LP-branch / pyramid "
                        "ablations (random init — weight values do not "
                        "change conv timing)")
    p.add_argument("--s2d", action="store_true",
                   help="profile with the space-to-depth stem "
                        "(spec s2d_stem=true; exact remap, so random-init "
                        "timing is representative — models/s2d.py)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.trunk:
        return trunk_profile(args)

    from yolo_tpu.config import builtin_spec
    from yolo_tpu.decode import (cls2ang, decode_car, decode_car_pallas,
                                 decode_lp, decode_lp_pallas, decode_ocr,
                                 make_angle_offsets)
    from yolo_tpu.ops.batched_geometry import (project_corners_batched,
                                               unwarp_plates_batched,
                                               unwarp_plates_matmul)
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train import make_task

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    B, S = args.batch, args.size
    iters = args.iters

    rows = {}
    errors = {}

    def flush():
        # write after every stage: a crashed or killed later stage must
        # not erase the evidence already measured (the round-2 failure
        # mode was exactly an all-or-nothing artifact)
        if args.out:
            line = {"backend": backend, "batch": B, "size": S,
                    "ms": rows, "errors": errors or None,
                    "partial": True}
            with open(args.out, "w") as f:
                json.dump(line, f, indent=2)

    def stage(name, fn, fargs, probe):
        try:
            rows[name] = timeit(fn, fargs, iters, probe)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"stage {name} FAILED: {errors[name]}")
        flush()

    spec = builtin_spec("carlp_v1").replace(size=[S, S])
    if args.s2d:
        spec = spec.replace(s2d_stem=True)
    ocr_spec = builtin_spec("ocr_v1")
    joint_task = make_task("carlp", spec, dtype=dtype)
    ocr_task = make_task("ocr", ocr_spec, dtype=dtype)
    key = jax.random.PRNGKey(0)
    jv = joint_task.init_variables(key)
    ov = ocr_task.init_variables(key)
    frames = jax.random.uniform(key, (B, S, S, 3), jnp.float32)

    # NOTE: variables are always jit ARGUMENTS, never closure constants —
    # constant-folded weights blow up the serialized module past the
    # remote-compile transport limit (HTTP 413) and disable donation.

    # ---- stage 1: joint network forward ----
    fwd = jax.jit(lambda v, f: joint_task.apply_eval(v, f))
    stage("joint_forward", fwd, (jv, frames),
          lambda r: r[1].astype(jnp.float32)[0, 0, 0, 0])

    # ---- stage 2: + decode (both impls) ----
    from yolo_tpu.ops.boxes import make_grid_tables
    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    cos_off, sin_off = make_angle_offsets(spec.classes)

    def with_decode(dc, dl):
        def f(v, fr):
            car_out, lp_map = joint_task.apply_eval(v, fr)
            car_out = [o.astype(jnp.float32) for o in car_out]
            car = dc(car_out, grids, spec.slice_point, spec.size)
            azi, _ = cls2ang(car[:, 0], car[:, 6:], cos_off, sin_off)
            car = car.at[:, 5].set(azi)
            lp = dl(lp_map.astype(jnp.float32), spec.LP_r_max)
            return car, lp
        return jax.jit(f)

    stage("fwd+decode_xla", with_decode(decode_car, decode_lp),
          (jv, frames), lambda r: r[0][0, 0])
    stage("fwd+decode_pallas",
          with_decode(decode_car_pallas, decode_lp_pallas), (jv, frames),
          lambda r: r[0][0, 0])

    # ---- stage 3: unwarp impls in isolation ----
    poses = jnp.tile(jnp.asarray([[0., 0., 2500., .2, .3, .1]]), (B, 1))
    corners = project_corners_batched(
        poses, JointPipeline(joint_task, ocr_task).projector.camera, (S, S))
    img16 = frames.astype(dtype)
    for name, impl, hw in (
            ("unwarp_gather_64x160", "gather", (64, 160)),
            ("unwarp_gather_80x192", "gather", (80, 192)),
            ("unwarp_matmul_64x160", "matmul", (64, 160))):
        if impl == "gather":
            f = jax.jit(lambda im, c, hw=hw: unwarp_plates_batched(
                im, c, (160, 384), sample_hw=hw))
        else:
            f = jax.jit(lambda im, c, hw=hw: unwarp_plates_matmul(
                im, c, hw))
        stage(name, f, (img16, corners),
              lambda r: r.astype(jnp.float32)[0, 0, 0, 0])

    # ---- stage 4: OCR forward on crops ----
    crops = jax.random.uniform(key, (B, 160, 384, 3), jnp.float32)
    ocr_fwd = jax.jit(lambda v, c: ocr_task.apply_eval(v, c))
    stage("ocr_forward", ocr_fwd, (ov, crops),
          lambda r: r[0].astype(jnp.float32)[0, 0, 0, 0])

    # ---- full pipelines ----
    for name, kw in (
            ("full_pipeline_default", dict(unwarp_sample_hw=(64, 160))),
            ("full_pipeline_pallas_decode",
             dict(unwarp_sample_hw=(64, 160), decode_impl="pallas"))):
        pipe = JointPipeline(joint_task, ocr_task, **kw)
        f = pipe.jit()
        stage(name, f, (jv, ov, frames), lambda r: r.car[0, 0])

    # ---- MFU for the headline point (v5e bf16 peak = 197 TFLOP/s) ----
    mfu = None
    try:
        pipe = JointPipeline(joint_task, ocr_task,
                             unwarp_sample_hw=(64, 160))
        lowered = jax.jit(pipe.__call__).lower(jv, ov, frames)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        ms = rows.get("full_pipeline_default")
        if flops > 0 and ms:
            peak = 197e12 if backend == "tpu" else None
            if peak:
                mfu = flops / (ms * 1e-3) / peak
    except Exception as e:  # cost analysis is best-effort per backend
        print(f"cost_analysis unavailable: {e!r}")

    if args.trace:
        try:
            pipe = JointPipeline(joint_task, ocr_task,
                                 unwarp_sample_hw=(64, 160))
            f = pipe.jit()
            r = f(jv, ov, frames)
            float(r.car[0, 0])
            with jax.profiler.trace(args.trace):
                for _ in range(5):
                    r = f(jv, ov, frames)
                float(r.car[0, 0])
        except Exception as e:
            errors["trace"] = f"{type(e).__name__}: {e}"[:500]
            print(f"trace FAILED: {errors['trace']}")

    print(f"\n| stage | ms/iter (B={B}, {S}x{S}, {backend}) | fps |")
    print("|---|---|---|")
    for k, v in rows.items():
        print(f"| {k} | {v:.2f} | {B / v * 1e3:.0f} |")
    if mfu is not None:
        print(f"| MFU (full pipeline, {backend} bf16 peak) | "
              f"{mfu * 100:.1f}% | |")
    line = {"backend": backend, "batch": B, "size": S, "ms": rows,
            "s2d_stem": bool(args.s2d),
            "mfu_full_pipeline": mfu, "errors": errors or None,
            "partial": False}
    print(json.dumps(line))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(line, f, indent=2)
    return rows




def trunk_profile(args):
    """Decompose the joint forward's 34 ms (reports/profile_pipeline.json)
    into backbone stages, the car pyramid, and the 5-block LP branch.

    Analytic FLOP counting says the LP branch (5 stacked detection blocks
    at the stride-16 fused feature, models/yolov3.py:113-120, reference
    car_and_LP/YOLO.py:69-77) is ~18 GFLOP/frame — more than the whole
    backbone — so the decomposition decides whether the next MFU lever is
    the branch, the early high-res stages, or the pyramid glue. Variants
    are fresh random-init modules: conv timing is weight-value-independent.
    """
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from yolo_tpu.config import builtin_spec
    from yolo_tpu.models.layers import (ConvBNLeaky, DarknetBlock,
                                        YOLODetectionBlock, YOLOOutput,
                                        upsample2x)

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    B, S, iters = args.batch, args.size, args.iters
    spec = builtin_spec("carlp_v1").replace(size=[S, S])

    class Variant(nn.Module):
        """CarLPNet with ablatable parts. n_stages < len(layers) stops
        the backbone early (prefix timing); lp_blocks / with_pyramid
        ablate the heads."""
        n_stages: int
        lp_blocks: int = 0
        with_pyramid: bool = False

        @nn.compact
        def __call__(self, x):
            layers, channels = spec.layers, spec.channels
            anchors = spec.all_anchors
            num_levels = len(anchors)
            routes = []
            x = ConvBNLeaky(channels[0], 3, 1, dtype=dtype)(x, False)
            for si in range(self.n_stages):
                x = ConvBNLeaky(channels[si + 1], 3, 2, dtype=dtype)(
                    x, False)
                for _ in range(layers[si]):
                    x = DarknetBlock(channels[si + 1] // 2,
                                     dtype=dtype)(x, False)
                if si >= len(layers) - num_levels:
                    routes.append(x)
            if not (self.with_pyramid or self.lp_blocks):
                return (x,)
            pyr_channels = channels[-num_levels:][::-1]
            outs = []
            for i in range(num_levels):
                if i == num_levels - 1 and self.lp_blocks:
                    lp = x
                    for _ in range(self.lp_blocks):
                        _, lp = YOLODetectionBlock(
                            spec.channels[-3], dtype=dtype)(lp, False)
                    outs.append(nn.Conv(
                        spec.LP_slice_point[-1], (1, 1), dtype=dtype,
                        param_dtype=jnp.float32)(lp))
                if self.with_pyramid:
                    route, tip = YOLODetectionBlock(
                        pyr_channels[i], dtype=dtype)(x, False)
                    outs.append(YOLOOutput(
                        spec.slice_point[-1],
                        len(anchors[::-1][i]), dtype=dtype)(tip))
                if i == num_levels - 1:
                    break
                if self.with_pyramid:
                    t = ConvBNLeaky(pyr_channels[i + 1], 1,
                                    dtype=dtype)(route, False)
                    t = upsample2x(t)
                    x = jnp.concatenate([t, routes[::-1][i + 1]], -1)
                else:
                    x = routes[::-1][i + 1]
            return tuple(outs)

    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (B, S, S, 3), dtype)
    rows, errors = {}, {}

    def flush(partial=True):
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"backend": backend, "batch": B, "size": S,
                           "mode": "trunk", "ms": rows,
                           "errors": errors or None, "partial": partial},
                          f, indent=2)

    def run(name, variant):
        try:
            v = jax.jit(variant.init)(key, frames)
            f = jax.jit(lambda vv, fr: variant.apply(vv, fr))
            rows[name] = timeit(
                f, (v, frames), iters,
                lambda r: r[0].astype(jnp.float32).reshape(-1)[0])
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:400]
            print(f"variant {name} FAILED: {errors[name]}")
        flush()

    n = len(spec.layers)
    for k in range(1, n + 1):
        run(f"backbone_stages_1..{k}", Variant(n_stages=k))
    run("backbone+pyramid", Variant(n_stages=n, with_pyramid=True))
    run("backbone+lp5", Variant(n_stages=n, lp_blocks=5))
    run("backbone+pyramid+lp5 (full)",
        Variant(n_stages=n, with_pyramid=True, lp_blocks=5))
    run("backbone+pyramid+lp2", Variant(n_stages=n, with_pyramid=True,
                                        lp_blocks=2))

    print(f"\n| variant | ms/iter (B={B}, {S}x{S}, {backend}) |")
    print("|---|---|")
    prev = 0.0
    for k, v in rows.items():
        print(f"| {k} | {v:.2f} (+{v - prev:.2f}) |")
        prev = v
    flush(partial=False)
    print(json.dumps({"backend": backend, "batch": B, "size": S,
                      "mode": "trunk", "ms": rows,
                      "errors": errors or None}))
    return rows


if __name__ == "__main__":
    main()
