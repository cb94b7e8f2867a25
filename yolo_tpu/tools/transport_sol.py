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

The JSON it writes is the speed-of-light table the node's FPS is
gated by: predicted_fps = h2d_bandwidth / bytes_per_frame. Compare
with the measured node FPS to show the node adds no overhead, and
with bench.py (frames already on device) for the compute-only ceiling.

    python -m yolo_tpu.tools.transport_sol --out reports/transport_sol.json
"""
from __future__ import annotations

import argparse
import ctypes
import json
import os
import statistics
import tempfile
import time

import numpy as np

FRAME_BYTES_RGB = 416 * 416 * 3          # u8 RGB wire frame
FRAME_BYTES_NV12 = 416 * 416 * 3 // 2    # packed 4:2:0 wire frame


def _export_slice_program(n_in: int, path: str):
    """u8[n_in] -> u8[8]: all h2d, no compute, negligible readback."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.serve.export import export_stablehlo

    export_stablehlo(lambda x: (x[:8],),
                     (jax.ShapeDtypeStruct((n_in,), jnp.uint8),), path,
                     platforms=["tpu"])


def _export_tile_program(n_in: int, n_out: int, path: str):
    """u8[n_in] -> u8[n_out]: tiny upload, all readback."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.serve.export import export_stablehlo

    reps = (n_out + n_in - 1) // n_in

    export_stablehlo(lambda x: (jnp.tile(x, reps)[:n_out],),
                     (jax.ShapeDtypeStruct((n_in,), jnp.uint8),), path,
                     platforms=["tpu"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default=os.environ.get(
        "YOLO_TPU_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so"))
    p.add_argument("--out", default=None)
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--depths", default="1,2,4,8")
    p.add_argument("--upload-sizes-kb", default="64,512,4096,16384")
    args = p.parse_args(argv)

    # this process exports StableHLO only; keep jax off the device so the
    # shim client below owns the chip claim (pjrt_node_demo semantics)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from yolo_tpu.serve.native import (axon_create_options_env,
                                       load_pjrt_library)

    lib = load_pjrt_library()
    if lib is None:
        raise SystemExit("native pjrt_shim library unavailable")
    lib.ps_last_timings.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_double)]

    os.environ.setdefault("PJRT_CREATE_OPTIONS",
                          axon_create_options_env(args.plugin))

    with tempfile.TemporaryDirectory() as td:
        slice_mod = os.path.join(td, "slice.mlir")
        tile_mod = os.path.join(td, "tile.mlir")
        batch8 = 8 * FRAME_BYTES_RGB          # the node's batch-8 payload
        _export_slice_program(batch8, slice_mod)
        d2h_bytes = 8 * 1024 * 1024
        _export_tile_program(1024, d2h_bytes, tile_mod)

        eng = ctypes.c_void_p(lib.ps_create(args.plugin.encode()))
        if not eng:
            raise SystemExit("PJRT client creation failed")

        def compile_module(path):
            blob = open(path, "rb").read()
            if lib.ps_compile(eng, blob, len(blob)) != 0:
                raise SystemExit("compile failed: " +
                                 lib.ps_last_error(eng).decode())

        def execute_sync(arr):
            a = np.ascontiguousarray(arr)
            data = (ctypes.c_void_p * 1)(a.ctypes.data_as(ctypes.c_void_p))
            dim_arr = (ctypes.c_int64 * 1)(a.size)
            dims = (ctypes.POINTER(ctypes.c_int64) * 1)(dim_arr)
            ndims = (ctypes.c_int * 1)(1)
            types = (ctypes.c_int * 1)(2)     # u8
            n = lib.ps_execute(eng, data, dims, ndims, types, 1)
            if n < 0:
                raise SystemExit("execute failed: " +
                                 lib.ps_last_error(eng).decode())
            t = (ctypes.c_double * 3)()
            lib.ps_last_timings(eng, t)
            return t[0], t[1], t[2]

        def execute_pipelined(arr_pool, depth, n_batches):
            """Steady wall/batch with `depth` dispatches in flight."""
            packs = []
            for a in arr_pool:
                data = (ctypes.c_void_p * 1)(
                    a.ctypes.data_as(ctypes.c_void_p))
                dim_arr = (ctypes.c_int64 * 1)(a.size)
                dims = (ctypes.POINTER(ctypes.c_int64) * 1)(dim_arr)
                ndims = (ctypes.c_int * 1)(1)
                types = (ctypes.c_int * 1)(2)
                packs.append((data, dims, ndims, types))
            t_marks = []
            for b in range(n_batches):
                d, dm, nd, ty = packs[b % len(packs)]
                if lib.ps_execute_async(eng, d, dm, nd, ty, 1) < 0:
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
            # steady = between-harvest gaps, excluding the warm-up harvest
            gaps = [t_marks[i + 1] - t_marks[i]
                    for i in range(1, len(t_marks) - 1)]
            return statistics.median(gaps) * 1e3 if gaps else 0.0

        report = {"plugin": args.plugin}

        # ---- 1) pipelined h2d throughput (the node's regime) ----------
        compile_module(slice_mod)
        rng = np.random.default_rng(0)
        pool = [rng.integers(0, 256, batch8).astype(np.uint8)
                for _ in range(4)]
        execute_sync(pool[0])                 # warm compile/claim
        piped = {}
        for depth in [int(d) for d in args.depths.split(",")]:
            ms = execute_pipelined(pool, depth, max(args.reps * 2, 10))
            piped[str(depth)] = {
                "ms_per_batch": round(ms, 3),
                "h2d_MBps": round(batch8 / 1e6 / (ms / 1e3), 1)
                if ms else None,
                "pred_fps_rgb416": round(
                    (batch8 / FRAME_BYTES_RGB) / (ms / 1e3), 1)
                if ms else None,
                "pred_fps_nv12_416": round(
                    (batch8 / FRAME_BYTES_NV12) / (ms / 1e3) * 2, 1)
                if ms else None,
            }
        report["pipelined_h2d_batch8eq"] = {
            "payload_bytes": batch8, "by_depth": piped}

        # ---- 2) d2h bandwidth ------------------------------------------
        compile_module(tile_mod)
        tiny = rng.integers(0, 256, 1024).astype(np.uint8)
        execute_sync(tiny)                    # warm
        d2h_ms = [execute_sync(tiny)[2] for _ in range(args.reps)]
        med = statistics.median(d2h_ms)
        report["d2h"] = {"bytes": d2h_bytes,
                         "ms_median": round(med, 3),
                         "MBps": round(d2h_bytes / 1e6 / (med / 1e3), 1)}

        # ---- 3) sync upload bandwidth + RTT (persistent-arg path) ------
        # AFTER all executes: ps_upload appends persistent args which
        # would otherwise ride along with every later execute.
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

    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
