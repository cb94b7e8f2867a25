"""Headline benchmark: batched LPD+VOR FPS per chip at 416x416.

Runs the fused joint pipeline (CarLPNet -> car box/viewpoint + LP pose ->
perspective unwarp -> OCR peaks) on 416x416 frames letterboxed on device
to the 448x448-compiled program, bf16 activations, and reports steady-state
frames/second on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/1000}
(baseline = the driver-supplied 1000 FPS/chip north star; the reference
itself published only ~50 FPS on a Jetson Xavier, README.md:64).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main_multichip(n_devices: int):
    """Aggregate-FPS benchmark of the sharded serving path
    (serve.video.ShardedVideoNode): the global frame batch is sharded over
    an n-device mesh, every device runs the fused LPD+VOR+OCR pipeline on
    its shard. Real multi-chip hardware is not attached to this host, so
    this path runs on virtual CPU devices — the number demonstrates the
    scaling mechanics, not chip speed (the headline single-chip number is
    the default mode)."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{n_devices}").strip()
    jax.config.update("jax_platforms", "cpu")

    from yolo_tpu.config import builtin_spec
    from yolo_tpu.parallel.mesh import batch_sharding, make_mesh
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train import make_task

    # skeleton-width net on CPU; the point is the sharded program shape
    spec = builtin_spec("carlp_v1").replace(
        size=[128, 128], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    ocr_spec = builtin_spec("ocr_v1").replace(
        num_init_features=8, growth_rate=4, block_config=[2, 2, 2, 2])
    joint_task = make_task("carlp", spec)
    ocr_task = make_task("ocr", ocr_spec)
    key = jax.random.PRNGKey(0)
    jv = joint_task.init_variables(key)
    ov = ocr_task.init_variables(key)
    pipe = JointPipeline(joint_task, ocr_task, unwarp_sample_hw=(40, 96))

    mesh = make_mesh(n_devices=n_devices)
    bsh = batch_sharding(mesh)
    per_dev = 2
    batch = per_dev * n_devices
    fn = jax.jit(lambda f: pipe(jv, ov, f), in_shardings=(bsh,))
    frames = jax.device_put(
        jax.random.uniform(key, (batch, 128, 128, 3), jnp.float32), bsh)

    res = fn(frames)
    assert len(res.car.sharding.device_set) == n_devices
    float(res.car[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fn(frames)
    float(res.car[0, 0])
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(json.dumps({
        "metric": f"aggregate_fps_{n_devices}dev_sharded_LPD+VOR+OCR",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 1000.0, 4),
        "batch": batch,
        "devices": n_devices,
        "backend": "cpu-virtual",
    }))


def main():
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train import make_task

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    # Defaults: the best MEASURED operating point. reports/
    # bench_defaults.json is written by the session queue
    # (scripts/queue_extra.d/05_pick_bench_point.sh) as the argmax over
    # this session's committed bench artifacts, so a bare `python
    # bench.py` (the driver invocation) runs the fastest configuration
    # that has actually been recorded. Fallback: batch 128, stock stem
    # (the round-4 sweep optimum — reports/bench_b128.json, 1700 FPS vs
    # 1639 at 96, 1435 at 64). Env vars override both for sweeps.
    picked = {}
    try:
        with open("reports/bench_defaults.json") as f:
            picked = json.load(f)
    except Exception:
        pass
    batch = int(os.environ.get(
        "YOLO_TPU_BENCH_BATCH",
        str(picked.get("batch", 128)) if on_tpu else "4"))
    iters = 50 if on_tpu else 3
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # flagship operating point: full carlp topology at 448x448
    # (416 frames stride-64 letterboxed on device). The spec must come
    # from the SAME place as the weights — carlp_v3 is trained on refit
    # anchors, and decoding its weights with the builtin v1 anchor
    # tables yields wrong boxes (timing would be identical, but the
    # benched program must be the real deployable artifact).
    from yolo_tpu.config import load_spec
    joint_dir, spec, spec_src = None, None, "builtin carlp_v1"
    for d in ("trained/carlp_v6", "trained/carlp_v5", "trained/carlp_v4",
              "trained/carlp_v3", "trained/carlp_v2", "trained/carlp_v1"):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        for spec_path in (os.path.join(d, "spec.yaml"),
                          os.path.join("runs", name, "spec.yaml")):
            if os.path.isfile(spec_path):
                joint_dir, spec, spec_src = d, load_spec(spec_path), \
                    spec_path
                break
        if joint_dir is None and name == "carlp_v1":
            joint_dir = d       # v1 IS the builtin spec; others are not
        if joint_dir is not None:
            break
        print(f"# bench: skipping {d} — no spec.yaml next to the "
              f"weights or under runs/{name}/ (spec/weights mismatch "
              f"would mis-decode)", file=sys.stderr)
    if spec is None:
        spec = builtin_spec("carlp_v1")
    print(f"# bench spec: {spec_src}", file=sys.stderr)
    spec = spec.replace(size=[448, 448])
    ocr_spec = builtin_spec("ocr_v1")

    # YOLO_TPU_S2D=1: run the space-to-depth stem (models/s2d.py) — an
    # exact no-retraining remap of the first two convs; trained weights
    # are converted after restore (pack_stem_variables). Default comes
    # from the measured pick (bench_defaults.json) once the chip A/B
    # has recorded it (docs/MFU_CLOSEOUT.md); env overrides.
    use_s2d = os.environ.get(
        "YOLO_TPU_S2D",
        "1" if (on_tpu and picked.get("s2d")) else "0") == "1"
    if use_s2d:
        spec = spec.replace(s2d_stem=True)

    joint_task = make_task("carlp", spec, dtype=dtype)
    ocr_task = make_task("ocr", ocr_spec, dtype=dtype)
    key = jax.random.PRNGKey(0)
    jv = joint_task.init_variables(key)
    ov = ocr_task.init_variables(key)

    # run with the packaged trained weights when present (identical program
    # and speed; makes the benchmark the real deployable artifact)
    weight_provenance = {"joint": "random-init", "ocr": "random-init"}

    def try_restore(variables, path, slot):
        try:
            from yolo_tpu.train.checkpoint import restore_tree
            tree = restore_tree(path)
            weight_provenance[slot] = path
            return {"params": tree["params"],
                    "batch_stats": tree.get("batch_stats", {})}
        except Exception as e:
            # loudly record which weights the bench actually ran — a
            # silent fall-through to random weights misrepresents the
            # benchmark as the deployable artifact (round-2 weak #3)
            print(f"# bench: restore FAILED for {path}: {e!r}",
                  file=sys.stderr)
            weight_provenance[slot] = f"random-init (restore failed: {path})"
            return variables
    if joint_dir is not None:
        if use_s2d:
            # restore the UNPACKED checkpoint into an unpacked template,
            # then convert — the packed init above has the wrong shapes
            # for orbax restore
            plain_task = make_task(
                "carlp", spec.replace(s2d_stem=False), dtype=dtype)
            plain = try_restore(plain_task.init_variables(key),
                                joint_dir, "joint")
            if weight_provenance["joint"] == joint_dir:
                from yolo_tpu.models.s2d import pack_stem_variables
                jv = pack_stem_variables(plain)
        else:
            jv = try_restore(jv, joint_dir, "joint")
    for ocr_dir in ("trained/ocr_v4", "trained/ocr_v3", "trained/ocr_v2",
                    "trained/ocr_v1_cascade"):
        if os.path.isdir(ocr_dir):
            ov = try_restore(ov, ocr_dir, "ocr")
            break
    print(f"# bench weights: {weight_provenance}", file=sys.stderr)
    # pipeline defaults: (64, 160) unwarp sampling is both the batch-64
    # sweep optimum and accuracy-neutral (reports/eval_unwarp_*.json).
    # YOLO_TPU_BENCH_WARP overrides the rectification impl for gather-vs-
    # matmul A/Bs without changing the driver-invoked default (matmul —
    # the A/B winner, reports/bench_warp_matmul.json). The value is
    # validated inside the pipeline (resolve_warp_impl raises on typos)
    # and the JSON line records the impl that actually ran.
    pipe_kw = {}
    if os.environ.get("YOLO_TPU_BENCH_WARP"):
        pipe_kw["warp_impl"] = os.environ["YOLO_TPU_BENCH_WARP"]
    pipe = JointPipeline(joint_task, ocr_task, **pipe_kw)
    fn = pipe.jit()

    frames = jax.random.uniform(key, (batch, 416, 416, 3), jnp.float32)

    # timing note: on remote-device transports block_until_ready can be a
    # no-op; a host readback of (a scalar from) the LAST result is the
    # reliable barrier — the device runs programs FIFO, so the last result
    # being real implies all prior iterations completed.
    def run_once(fr):
        res = fn(jv, ov, fr)
        return res, res.car[0, 0]

    res, probe = run_once(frames)           # warmup / compile
    float(probe)

    t0 = time.perf_counter()
    for _ in range(iters):
        res, probe = run_once(frames)
    float(probe)                            # barrier
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "fps_per_chip_416x416_batched_LPD+VOR+OCR",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 1000.0, 4),
        "batch": batch,
        "backend": backend,
        "warp_impl": pipe.warp_impl,
        "s2d_stem": use_s2d,
        "weights": weight_provenance,
        "spec": spec_src,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--multichip":
        main_multichip(int(sys.argv[2]))
    else:
        main()
