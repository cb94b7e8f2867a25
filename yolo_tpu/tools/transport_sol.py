"""Transport speed-of-light probe for the native serving path.

The round-4 native-node measurements (reports/pjrt_node_demo.json
84.8 FPS @ batch 8, reports/pjrt_node_b64.json 48.9 FPS @ batch 64)
pointed at "d2h" as the wall, but the per-batch wall tracks the
*input* bytes (4.15 MB -> 94 ms, 33 MB -> 1308 ms): the harvest-time
"d2h event await" is simply queued behind the h2d frame stream on the
remote transport. This tool measures the transport itself through the
SAME C++ shim the node uses (native/pjrt_shim.cpp):

* sync upload bandwidth at several transfer sizes (+ a tiny-transfer
  RTT estimate);
* pipelined h2d throughput at node-like batch sizes across dispatch
  depths (a trivial ``x[:8]`` program, so compute and readback are
  nil — the steady wall IS the transport);
* d2h bandwidth via a tile-up program with a tiny input.

Process layout mirrors tools.pjrt_node_demo: the PARENT only lowers the
two probe programs to StableHLO with jax (CPU-pinned) and then spawns a
jax-free WORKER subprocess that does every PJRT call through ctypes.
(The first on-chip attempts wedged in the warm execute — futex wait,
reports/logs/transport_sol.log; the clean-subprocess split plus
non-aliasing f32 probe outputs are the two suspects addressed.)

The JSON it writes is the speed-of-light table the node's FPS is gated
by: predicted_fps = h2d_bandwidth / bytes_per_frame. Compare with the
measured node FPS to show the node adds no overhead, and with bench.py
(frames already on device) for the compute-only ceiling.

    python -m yolo_tpu.tools.transport_sol --out reports/transport_sol.json
"""
from __future__ import annotations

import argparse
import ctypes
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

FRAME_BYTES_RGB = 416 * 416 * 3          # u8 RGB wire frame
FRAME_BYTES_NV12 = 416 * 416 * 3 // 2    # packed 4:2:0 wire frame
BATCH8 = 8 * FRAME_BYTES_RGB             # the node's batch-8 payload
D2H_BYTES = 8 * 1024 * 1024


def log(msg):
    print(f"[transport_sol] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# parent: lower the probe programs, then delegate to the jax-free worker
# ---------------------------------------------------------------------------

def export_programs(td: str):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.serve.export import export_stablehlo

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    slice_mod = os.path.join(td, "slice.mlir")
    tile_mod = os.path.join(td, "tile.mlir")
    log("lowering slice program (all-h2d probe)")
    # a real reduction to a fresh f32 scalar: an x[:8] u8 output is a
    # VIEW of the input buffer, and executing that program wedged the
    # axon transport twice (reports/logs/transport_sol.log) — aliased /
    # u8 outputs are off the node's proven path (f32 outputs only)
    export_stablehlo(
        lambda x: (jnp.sum(x.astype(jnp.float32)).reshape(1),),
        (jax.ShapeDtypeStruct((BATCH8,), jnp.uint8),),
        slice_mod, platforms=["tpu"])
    log("lowering tile program (all-d2h probe)")
    n_out = D2H_BYTES // 4                   # f32 elements
    reps = (n_out + 1023) // 1024
    export_stablehlo(
        lambda x: (jnp.tile(x.astype(jnp.float32), reps)[:n_out] * 0.5,),
        (jax.ShapeDtypeStruct((1024,), jnp.uint8),),
        tile_mod, platforms=["tpu"])
    return slice_mod, tile_mod


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default=os.environ.get(
        "YOLO_TPU_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so"))
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--depths", default="1,2,4,8")
    p.add_argument("--upload-sizes-kb", default="64,512,4096,16384")
    # internal: jax-free probe worker (all PJRT calls live here)
    p.add_argument("--worker", nargs=3, metavar=("SLICE", "TILE", "OUT"),
                   default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.worker:
        return probe_worker(args, *args.worker)

    # PJRT_CREATE_OPTIONS for the worker (fresh axon session), same as
    # the node demo
    shim = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libpjrt_shim.so")
    if not os.path.exists(shim):
        subprocess.run(["make", "-C", os.path.dirname(shim),
                        "libpjrt_shim.so"], check=True, capture_output=True)
    from yolo_tpu.serve.native import axon_create_options_env
    env = dict(os.environ)
    env.setdefault("PJRT_CREATE_OPTIONS",
                   axon_create_options_env(args.plugin))

    with tempfile.TemporaryDirectory() as td:
        slice_mod, tile_mod = export_programs(td)
        out_json = os.path.join(td, "report.json")
        argv2 = [sys.executable, "-m", "yolo_tpu.tools.transport_sol",
                 "--plugin", args.plugin, "--reps", str(args.reps),
                 "--depths", args.depths,
                 "--upload-sizes-kb", args.upload_sizes_kb,
                 "--worker", slice_mod, tile_mod, out_json]
        log("spawning jax-free probe worker")
        r = subprocess.run(argv2, env=env, timeout=1800)
        if r.returncode != 0 or not os.path.exists(out_json):
            raise SystemExit(f"probe worker failed rc={r.returncode}")
        report = json.load(open(out_json))

    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


# ---------------------------------------------------------------------------
# worker: ctypes-only PJRT probing (no jax anywhere in this process)
# ---------------------------------------------------------------------------

def load_shim():
    """Load libpjrt_shim.so directly — do NOT import yolo_tpu (its
    __init__ imports jax, which is exactly the mix the worker exists
    to avoid)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libpjrt_shim.so")
    lib = ctypes.CDLL(path)
    lib.ps_create.restype = ctypes.c_void_p
    lib.ps_create.argtypes = [ctypes.c_char_p]
    lib.ps_last_error.restype = ctypes.c_char_p
    lib.ps_last_error.argtypes = [ctypes.c_void_p]
    lib.ps_compile.restype = ctypes.c_int
    lib.ps_compile.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_size_t]
    lib.ps_upload.restype = ctypes.c_int
    lib.ps_upload.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                              ctypes.c_int]
    lib.ps_execute.restype = ctypes.c_int
    six = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
           ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
           ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
           ctypes.c_int]
    lib.ps_execute.argtypes = six
    lib.ps_execute_async.restype = ctypes.c_int
    lib.ps_execute_async.argtypes = six
    lib.ps_await_next.restype = ctypes.c_int
    lib.ps_await_next.argtypes = [ctypes.c_void_p]
    lib.ps_num_inflight.restype = ctypes.c_int
    lib.ps_num_inflight.argtypes = [ctypes.c_void_p]
    lib.ps_last_timings.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_double)]
    lib.ps_destroy.argtypes = [ctypes.c_void_p]
    return lib


def probe_worker(args, slice_mod: str, tile_mod: str, out_json: str):
    lib = load_shim()
    log(f"worker: creating client ({args.plugin})")
    eng = ctypes.c_void_p(lib.ps_create(args.plugin.encode()))
    if not eng:
        raise SystemExit("PJRT client creation failed")

    def compile_module(path):
        blob = open(path, "rb").read()
        log(f"worker: compiling {os.path.basename(path)} "
            f"({len(blob)} bytes)")
        t0 = time.perf_counter()
        if lib.ps_compile(eng, blob, len(blob)) != 0:
            raise SystemExit("compile failed: " +
                             lib.ps_last_error(eng).decode())
        log(f"worker: compiled in {time.perf_counter() - t0:.1f}s")

    def pack1(a):
        data = (ctypes.c_void_p * 1)(a.ctypes.data_as(ctypes.c_void_p))
        dim_arr = (ctypes.c_int64 * 1)(a.size)
        dims = (ctypes.POINTER(ctypes.c_int64) * 1)(dim_arr)
        ndims = (ctypes.c_int * 1)(1)
        types = (ctypes.c_int * 1)(2)     # u8
        return (a, data, dims, dim_arr, ndims, types)

    def execute_sync(pack):
        _, data, dims, _, ndims, types = pack
        n = lib.ps_execute(eng, data, dims, ndims, types, 1)
        if n < 0:
            raise SystemExit("execute failed: " +
                             lib.ps_last_error(eng).decode())
        t = (ctypes.c_double * 3)()
        lib.ps_last_timings(eng, t)
        return t[0], t[1], t[2]

    def execute_pipelined(packs, depth, n_batches):
        t_marks = []
        for b in range(n_batches):
            _, data, dims, _, ndims, types = packs[b % len(packs)]
            if lib.ps_execute_async(eng, data, dims, ndims, types, 1) < 0:
                raise SystemExit("dispatch failed: " +
                                 lib.ps_last_error(eng).decode())
            if lib.ps_num_inflight(eng) >= depth or b == 0:
                if lib.ps_await_next(eng) < 0:
                    raise SystemExit("await failed: " +
                                     lib.ps_last_error(eng).decode())
                t_marks.append(time.perf_counter())
        while lib.ps_num_inflight(eng) > 0:
            if lib.ps_await_next(eng) < 0:
                raise SystemExit("await failed: " +
                                 lib.ps_last_error(eng).decode())
            t_marks.append(time.perf_counter())
        gaps = [t_marks[i + 1] - t_marks[i]
                for i in range(1, len(t_marks) - 1)]
        return statistics.median(gaps) * 1e3 if gaps else 0.0

    report = {"plugin": args.plugin}
    rng = np.random.default_rng(0)

    # ---- 1) pipelined h2d throughput (the node's regime) --------------
    compile_module(slice_mod)
    pool = [pack1(rng.integers(0, 256, BATCH8).astype(np.uint8))
            for _ in range(4)]
    log("worker: warm execute (slice)")
    execute_sync(pool[0])
    piped = {}
    for depth in [int(d) for d in args.depths.split(",")]:
        log(f"worker: pipelined h2d, depth {depth}")
        ms = execute_pipelined(pool, depth, max(args.reps * 2, 10))
        piped[str(depth)] = {
            "ms_per_batch": round(ms, 3),
            "h2d_MBps": round(BATCH8 / 1e6 / (ms / 1e3), 1) if ms else None,
            "pred_fps_rgb416": round(8 / (ms / 1e3), 1) if ms else None,
            "pred_fps_nv12_416": round(16 / (ms / 1e3), 1) if ms else None,
        }
    report["pipelined_h2d_batch8eq"] = {
        "payload_bytes": BATCH8, "by_depth": piped}

    # ---- 2) d2h bandwidth ---------------------------------------------
    compile_module(tile_mod)
    tiny = pack1(rng.integers(0, 256, 1024).astype(np.uint8))
    log("worker: warm execute (tile)")
    execute_sync(tiny)
    d2h_ms = [execute_sync(tiny)[2] for _ in range(args.reps)]
    med = statistics.median(d2h_ms)
    report["d2h"] = {"bytes": D2H_BYTES, "ms_median": round(med, 3),
                     "MBps": round(D2H_BYTES / 1e6 / (med / 1e3), 1)}

    # ---- 3) sync upload bandwidth + RTT (persistent-arg path) ----------
    # AFTER all executes: ps_upload appends persistent args which would
    # otherwise ride along with every later execute.
    uploads = {}
    for kb in [int(x) for x in args.upload_sizes_kb.split(",")]:
        a = rng.integers(0, 256, kb * 1024).astype(np.uint8)
        dims = (ctypes.c_int64 * 1)(a.size)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            if lib.ps_upload(eng, a.ctypes.data_as(ctypes.c_void_p),
                             dims, 1, 2) < 0:
                raise SystemExit("upload failed: " +
                                 lib.ps_last_error(eng).decode())
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        uploads[f"{kb}KB"] = {"ms_median": round(med * 1e3, 3),
                              "MBps": round(kb / 1024 / med, 1)}
        log(f"worker: sync upload {kb}KB: {uploads[f'{kb}KB']}")
    tiny4 = np.zeros(4, np.uint8)
    dims4 = (ctypes.c_int64 * 1)(4)
    rtts = []
    for _ in range(max(args.reps * 3, 12)):
        t0 = time.perf_counter()
        lib.ps_upload(eng, tiny4.ctypes.data_as(ctypes.c_void_p),
                      dims4, 1, 2)
        rtts.append(time.perf_counter() - t0)
    report["sync_upload"] = uploads
    report["rtt_ms_median"] = round(statistics.median(rtts) * 1e3, 3)

    lib.ps_destroy(eng)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    log("worker: done")
    return 0


if __name__ == "__main__":
    main()
