"""End-to-end drive + verification of the fully native serving node.

Exports a model to raw StableHLO with the weights as trailing ARGUMENTS
(so the module stays small enough for the axon remote-compile transport,
and the C++ side uploads them once as device-resident buffers), renders
car+plate scenes, writes them as the raw RGB stream the framepipe ring
consumes, launches the C++ node (native/pjrt_node) as a subprocess
against a PJRT plugin, and numerically compares every batch of its
dumped outputs against the jax reference — the check the reference's
TensorRT path never had (SURVEY §2.3, tensorrt_ros).

    # toy model, fast smoke:
    python -m yolo_tpu.tools.pjrt_node_demo --plugin /opt/axon/libaxon_pjrt.so

    # the real trained flagship (carlp + OCR cascade):
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v1 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 6 [--bf16] [--out reports/pjrt_node_demo.json]
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

from yolo_tpu.serve.export import (export_stablehlo, flatten_weights,
                                   make_serving_fn, write_weights_bin)
from yolo_tpu.serve.native import _NATIVE_DIR, axon_create_options_env

REL_TOL = 5e-2          # per-element relative tolerance vs |output|max
BAD_FRAC_MAX = 0.02     # tolerated fraction of out-of-tolerance elements

# With a same-backend (TPU-vs-TPU) reference the only deltas are jax-vs-
# shim compile options, so the gates tighten: the round-3 ok=false runs
# were comparing a CPU f32 reference against the MXU's matmul numerics —
# a backend-numerics measurement, not a node verification.
REL_TOL_SAME_BACKEND = 1e-2
BAD_FRAC_SAME_BACKEND = 0.005


def toy_model():
    """Small conv detector head: frames -> (B, 8) feature summary."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 3, 8), jnp.float32) * 0.1

    def fn(x, wa):
        y = jax.lax.conv_general_dilated(
            x, wa, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (jnp.mean(jax.nn.leaky_relu(y, 0.1), axis=(1, 2)),)

    return fn, [w]


def carlp_model(weights_dir: str, ocr_weights_dir: str, bf16: bool,
                u8_hw=None, packed: bool = False, nv12: bool = False):
    """The trained flagship: JointPipeline (CarLPNet + OCR cascade)."""
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train import make_task
    from yolo_tpu.train.checkpoint import restore_tree

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    # the spec must come from the SAME place as the weights (bench.py
    # semantics): carlp_v3+ train on refit anchors — decoding their
    # weights with the builtin v1 anchor tables yields wrong boxes
    from yolo_tpu.config import load_spec
    spec = None
    for spec_path in (os.path.join(weights_dir, "spec.yaml"),
                      os.path.join("runs", os.path.basename(weights_dir),
                                   "spec.yaml")):
        if os.path.isfile(spec_path):
            spec = load_spec(spec_path)
            break
    if spec is None:
        spec = builtin_spec("carlp_v1")
    spec = spec.replace(size=[448, 448])
    ocr_spec = builtin_spec("ocr_v1")
    joint_task = make_task("carlp", spec, dtype=dtype)
    ocr_task = make_task("ocr", ocr_spec, dtype=dtype)

    def load(path):
        tree = restore_tree(path)
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}

    pipe = JointPipeline(joint_task, ocr_task)
    # ONE flat f32 weights argument (serve.export.flatten_weights): a
    # 500-argument executable exhausts the TPU's sync-flag memory
    flat, unflatten = flatten_weights(
        (load(weights_dir), load(ocr_weights_dir)))

    if packed:
        # serving mode: ONE flat (B, K) f32 output — every d2h on the
        # remote axon transport is latency-bound (a ToHostBuffer start
        # + an event-await round-trip each), so 5 outputs cost 5 waves
        # where 1 packed tensor costs 1. Host slices packed_sections().
        fn = make_serving_fn(pipe, unflatten, u8_hw=u8_hw, nv12=nv12)
    else:
        nh, nw = spec.size

        def fn(frames, flat_w):
            if u8_hw is not None:
                # raw u8 ingestion: letterbox + /255 on device;
                # bit-matches framepipe fp_ring_pop_batch / letterbox_np
                fh, fw = u8_hw
                dy, dx = (nh - fh) // 2, (nw - fw) // 2
                x = frames.astype(jnp.float32) / 255.0
                frames = jnp.pad(
                    x, ((0, 0), (dy, nh - fh - dy), (dx, nw - fw - dx),
                        (0, 0)), constant_values=0.5)
            jv2, ov2 = unflatten(flat_w)
            r = pipe(jv2, ov2, frames)
            return (r.car, r.lp, r.corners, r.ocr_scores,
                    r.ocr_cls.astype(jnp.int32))

    return fn, [flat], pipe.packed_sections()


def render_scenes(n_frames: int, fh: int, fw: int, classes, r_max,
                  seed: int = 7):
    """Car+plate scenes as uint8 RGB — confident detections make the
    decode argmax stable across backends (random frames would not)."""
    from yolo_tpu.render import (CarRenderer, LPRenderer,
                                 procedural_backgrounds)
    car_r = CarRenderer(fh, fw, classes)
    lp_r = LPRenderer(fh, fw)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    bg = procedural_backgrounds(k1, n_frames, fh, fw)
    imgs, _ = car_r.render(k2, bg, render_rate=1.0)
    imgs, _ = lp_r.add(k3, imgs, tuple(r_max), add_rate=1.0)
    return np.asarray(
        np.clip(np.asarray(imgs) * 255.0 + 0.5, 0, 255), np.uint8)


def letterbox_np(frames_u8: np.ndarray, nh: int, nw: int,
                 fill: float = 0.5) -> np.ndarray:
    """Replicates framepipe fp_ring_pop_batch: u8/255, centre-pad."""
    B, fh, fw, _ = frames_u8.shape
    out = np.full((B, nh, nw, 3), fill, np.float32)
    dy, dx = (nh - fh) // 2, (nw - fw) // 2
    out[:, dy:dy + fh, dx:dx + fw] = frames_u8.astype(np.float32) / 255.0
    return out


def _peak_string(row):
    """Decoded plate: class ids at peak columns (-1 elsewhere), in
    order. A one-column peak shift changes two column entries but not
    the plate string — the quantity serving consumers actually read."""
    return tuple(int(c) for c in row if c >= 0)


def compare_cls_ids(got, want, scores=None, threshold=0.6, margin=0.05):
    """Cross-backend check for an argmax-id output: element-wise rel-err
    is meaningless for ids (id 14 vs 33 is one flipped argmax, not a 58%
    numeric error — the round-3 output-5 0.576 signature). Report the
    per-column mismatch fraction and scene-level decoded-string
    agreement instead.

    ``scores``: the reference sigmoid peak scores aligned with the id
    columns. decode_ocr thresholds at 0.6 and requires beating both
    neighbours, so a column whose score sits within ``margin`` of the
    threshold (or of a neighbour) legitimately flips between two
    compiles of the same program — the float sections agree to <5%,
    which is exactly the flip band. Such plates are counted as
    ``borderline`` and excluded from ``plate_match_confident`` (the
    gated figure); a mismatch at a CONFIDENT column (score margin held,
    class argmax differs) still fails, since no rounding excuse exists."""
    mismatch = int((got != want).sum())
    n = max(len(got), 1)
    strings_eq = sum(
        _peak_string(g) == _peak_string(w) for g, w in zip(got, want))
    out = {"col_mismatch_frac": mismatch / max(got.size, 1),
           "plate_match": strings_eq / n}
    if scores is None:
        return out
    confident_n = confident_eq = borderline = 0
    for g, w, s in zip(got, want, scores):
        if _peak_string(g) == _peak_string(w):
            confident_n += 1
            confident_eq += 1
            continue
        cols = np.nonzero(g != w)[0]
        left = np.pad(s, (1, 0))[:-1]
        right = np.pad(s, (0, 1))[1:]
        near = (np.abs(s - threshold) < margin) \
            | (np.abs(s - left) < margin) | (np.abs(s - right) < margin)
        if bool(near[cols].any()):
            borderline += 1
        else:
            confident_n += 1
    out["borderline_frac"] = borderline / n
    out["plate_match_confident"] = confident_eq / max(confident_n, 1)
    return out


def compare_outputs(dump_dir: str, ref_batches, n_outputs: int,
                    rel_tol: float = REL_TOL):
    """Per-output element-wise check of the node's dumped outputs
    against the jax reference for every batch. Integer (argmax-id)
    outputs are checked by mismatch fraction + decoded-string agreement
    via compare_cls_ids, not by relative error."""
    per_output = []
    for o in range(n_outputs):
        max_rel, bad, total = 0.0, 0, 0
        is_int = np.asarray(ref_batches[0][o]).dtype.kind == "i"
        got_all, want_all, score_all = [], [], []
        for b, ref in enumerate(ref_batches):
            src = np.asarray(ref[o])
            want = src.astype(np.float32)
            path = os.path.join(dump_dir, f"b{b:03d}_o{o}.bin")
            raw = np.fromfile(path, np.uint8)
            got = raw.view(np.int32 if is_int else np.float32)
            got = got.astype(np.float32).reshape(want.shape)
            if is_int:
                got_all.append(got.reshape(got.shape[0], -1))
                want_all.append(want.reshape(want.shape[0], -1))
                # JointResult orders ocr_scores immediately before
                # ocr_cls; use it as the borderline-flip classifier when
                # the column counts line up (see compare_cls_ids)
                prev = np.asarray(ref[o - 1]) if o > 0 else None
                if prev is not None and prev.dtype.kind == "f" \
                        and prev.reshape(prev.shape[0], -1).shape \
                        == got_all[-1].shape:
                    score_all.append(prev.reshape(prev.shape[0], -1))
                continue
            denom = max(1e-6, float(np.abs(want).max()))
            rel = np.abs(got - want) / denom
            max_rel = max(max_rel, float(rel.max()))
            bad += int((rel > rel_tol).sum())
            total += rel.size
        if is_int:
            per_output.append(compare_cls_ids(
                np.concatenate(got_all), np.concatenate(want_all),
                scores=(np.concatenate(score_all)
                        if len(score_all) == len(got_all) else None)))
        else:
            per_output.append({"max_rel_err": max_rel,
                               "bad_frac": bad / max(total, 1)})
    return per_output


def compare_packed(dump_dir: str, ref_batches, spans,
                   rel_tol: float = REL_TOL):
    """Packed serving mode: one (B, K) f32 output per batch, sliced by
    ``spans`` into the logical sections and checked with the same
    per-section gates as the multi-output mode."""
    per_output = []
    score_span = {n: (l, h) for n, l, h in spans}.get("ocr_scores")
    for name, lo, hi in spans:
        max_rel, bad, total = 0.0, 0, 0
        got_all, want_all, score_all = [], [], []
        for b, ref in enumerate(ref_batches):
            want = np.asarray(ref[0])[:, lo:hi]
            path = os.path.join(dump_dir, f"b{b:03d}_o0.bin")
            got = np.fromfile(path, np.uint8).view(np.float32)
            got = got.reshape(np.asarray(ref[0]).shape)[:, lo:hi]
            if name == "ocr_cls":
                got_all.append(np.rint(got).astype(np.int32))
                want_all.append(np.rint(want).astype(np.int32))
                if score_span is not None:
                    score_all.append(np.asarray(
                        ref[0])[:, score_span[0]:score_span[1]])
                continue
            denom = max(1e-6, float(np.abs(want).max()))
            rel = np.abs(got - want) / denom
            max_rel = max(max_rel, float(rel.max()))
            bad += int((rel > rel_tol).sum())
            total += rel.size
        if name == "ocr_cls":
            entry = compare_cls_ids(
                np.concatenate(got_all), np.concatenate(want_all),
                scores=(np.concatenate(score_all) if score_all else None))
        else:
            entry = {"max_rel_err": max_rel,
                     "bad_frac": bad / max(total, 1)}
        entry["section"] = name
        per_output.append(entry)
    return per_output


def _build_model(args, fh, fw):
    """(fn, leaves, spans) for the requested model — shared between the
    parent process and the same-backend reference worker so both trace
    the identical program."""
    if args.model == "carlp":
        return carlp_model(
            args.weights, args.ocr_weights, args.bf16,
            u8_hw=(fh, fw) if args.u8 else None, packed=args.packed,
            nv12=args.nv12)
    fn, leaves = toy_model()
    return fn, leaves, None


def _ref_worker(args):
    """Compute the per-batch reference outputs on THIS process's jax
    backend (the parent launches it with JAX_PLATFORMS=tpu so the node's
    outputs are compared against the same hardware's numerics), save them
    as an .npz, and exit — releasing the device claim before the C++
    node starts."""
    geom = [int(x) for x in args.ref_geom.split(",")]
    fh, fw, nh, nw = geom
    fn, leaves, _ = _build_model(args, fh, fw)
    frames_u8 = np.load(args.ref_frames)
    net_frames = (frames_u8 if args.u8
                  else letterbox_np(frames_u8, nh, nw))
    B = args.batch
    ref_fn = jax.jit(fn)
    out = {}
    for b in range(args.batches):
        r = ref_fn(jnp.asarray(net_frames[b * B:(b + 1) * B]), *leaves)
        for o, x in enumerate(r):
            out["b%d_o%d" % (b, o)] = np.asarray(x)
    np.savez(args.ref_worker, n_outputs=len(ref_batch_keys(out)),
             **out)
    return 0


def ref_batch_keys(npz_like):
    """Number of outputs per batch in a ref npz mapping."""
    return sorted(k for k in npz_like if k.startswith("b0_o"))


def _compute_ref_batches(args, fh, fw, nh, nw, frames_u8, fn, leaves):
    """Reference outputs for every batch. Preferred: a subprocess pinned
    to the SAME backend the node serves on (JAX_PLATFORMS from
    --ref-backend) that computes and exits before the node claims the
    device. Fallback on worker failure: in-process CPU (cross-backend —
    loose gates). Returns (ref_batches, ref_backend_used)."""
    import sys

    if args.ref_backend != "cpu":
        with tempfile.TemporaryDirectory() as rtd:
            frames_npy = os.path.join(rtd, "frames.npy")
            np.save(frames_npy, frames_u8)
            ref_npz = os.path.join(rtd, "ref.npz")
            argv = [sys.executable, "-m", "yolo_tpu.tools.pjrt_node_demo",
                    "--ref-worker", ref_npz, "--ref-frames", frames_npy,
                    "--ref-geom", "%d,%d,%d,%d" % (fh, fw, nh, nw),
                    "--ref-backend", args.ref_backend,
                    "--model", args.model, "--weights", args.weights,
                    "--ocr-weights", args.ocr_weights,
                    "--batch", str(args.batch),
                    "--batches", str(args.batches)]
            for flag, on in (("--bf16", args.bf16), ("--u8", args.u8),
                             ("--packed", args.packed),
                             ("--nv12", args.nv12)):
                if on:
                    argv.append(flag)
            # cold carlp compiles on the chip can exceed 30 min (the
            # b16 nv12 ref worker died at exactly 1800 s); the queue's
            # run_step timeout is the real deadline
            r = subprocess.run(argv, capture_output=True, text=True,
                               timeout=3000)
            if r.returncode == 0 and os.path.exists(ref_npz):
                data = np.load(ref_npz)
                n_out = len(ref_batch_keys(data))
                ref = [[data["b%d_o%d" % (b, o)] for o in range(n_out)]
                       for b in range(args.batches)]
                return ref, args.ref_backend
            print("ref worker failed (falling back to in-process CPU "
                  "reference):\n%s" % r.stderr[-2000:])

    B = args.batch
    net_frames = (frames_u8 if args.u8
                  else letterbox_np(frames_u8, nh, nw))
    ref_fn = jax.jit(fn)
    ref = []
    for b in range(args.batches):
        r = ref_fn(jnp.asarray(net_frames[b * B:(b + 1) * B]), *leaves)
        ref.append([np.asarray(x) for x in r])
    return ref, "cpu"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default=os.environ.get(
        "YOLO_TPU_PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so"))
    p.add_argument("--model", choices=["toy", "carlp"], default="toy")
    p.add_argument("--weights", default="trained/carlp_v1")
    p.add_argument("--ocr-weights", default="trained/ocr_v2")
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (timing mode: comparison "
                        "tolerance is relaxed)")
    p.add_argument("--u8", action="store_true",
                   help="stream raw uint8 frames; letterbox+normalize "
                        "run on device (carlp model only)")
    p.add_argument("--packed", action="store_true",
                   help="serving-mode export: all outputs concatenated "
                        "into ONE (B, K) f32 tensor — one d2h latency "
                        "wave per batch instead of five (carlp only)")
    p.add_argument("--nv12", action="store_true",
                   help="stream packed NV12 (4:2:0) frames — the camera-"
                        "native format, HALF the u8-RGB bytes on the "
                        "bandwidth-bound transport; BT.601 conversion "
                        "runs on device (requires --u8 --packed)")
    p.add_argument("--depth", type=int, default=2,
                   help="node dispatch pipeline depth (1 = synchronous)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--ref-backend", default="tpu", choices=["tpu", "cpu"],
                   help="backend the verification reference runs on; "
                        "'tpu' (default) spawns a worker that computes "
                        "refs on the device and exits before the node "
                        "starts — same-hardware numerics, tight gates")
    p.add_argument("--out", default=None)
    # internal: same-backend reference worker (spawned by the parent
    # with JAX_PLATFORMS set; computes refs, saves npz, exits)
    p.add_argument("--ref-worker", default=None, help=argparse.SUPPRESS)
    p.add_argument("--ref-frames", default=None, help=argparse.SUPPRESS)
    p.add_argument("--ref-geom", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if (args.u8 or args.packed) and args.model != "carlp":
        raise SystemExit("--u8/--packed require --model carlp")
    if args.nv12 and not (args.u8 and args.packed):
        raise SystemExit("--nv12 requires --u8 --packed")

    if args.ref_worker:
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; the
        # config knob is the only reliable pin. 'tpu' = the device
        # default (axon claims the chip), 'cpu' = host.
        if args.ref_backend == "cpu":
            jax.config.update("jax_platforms", "cpu")
        return _ref_worker(args)

    # pin THIS process to CPU: if the demo's own jax touched the TPU it
    # would hold the device claim and the C++ child would deadlock
    # waiting for it. Export cross-lowers for TPU from the CPU process;
    # the verification reference comes from the --ref-backend worker.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    binary = os.path.join(_NATIVE_DIR, "pjrt_node")
    subprocess.run(["make", "-C", _NATIVE_DIR, "pjrt_node"], check=True,
                   capture_output=True)

    B, n_batches = args.batch, args.batches
    n_frames = B * n_batches

    if args.model == "carlp":
        from yolo_tpu.config import builtin_spec
        fh = fw = 416                 # flagship stream geometry
        nh = nw = 448                 # network canvas (letterboxed)
        fn, leaves, spans = _build_model(args, fh, fw)
        spec = builtin_spec("carlp_v1")
        frames_u8 = render_scenes(n_frames, fh, fw, spec.classes,
                                  spec.LP_r_max)
        if args.nv12:
            # the wire array IS the NV12 bytes from here on: the raw
            # stream file, the node input and the jax reference all
            # consume the identical frames. Wire shape is rank-4
            # (B, fh//2, fw, 3) — same linear bytes as the packed
            # (B, fh*3//2, fw) planes, and exactly one framepipe ring
            # slot of height fh/2, so the node's ring/pop/dims path is
            # IDENTICAL to the proven u8 mode
            from yolo_tpu.ops.image import rgb_to_nv12
            frames_u8 = rgb_to_nv12(frames_u8).reshape(
                n_frames, fh // 2, fw, 3)
    else:
        fh = fw = 96
        nh = nw = 128
        fn, leaves, spans = _build_model(args, fh, fw)
        frames_u8 = (np.random.default_rng(1)
                     .random((n_frames, fh, fw, 3)) * 255).astype(np.uint8)

    # jax reference per batch, with the exact inputs the node streams:
    # u8 mode feeds raw frames (letterbox runs inside fn on device);
    # f32 mode feeds centre-pad + /255 (framepipe pop_batch semantics).
    # Same-backend reference (the default) compares the node against the
    # device's own numerics; the CPU fallback is cross-backend.
    ref_batches, ref_backend = _compute_ref_batches(
        args, fh, fw, nh, nw, frames_u8, fn, leaves)
    n_outputs = len(ref_batches[0])

    with tempfile.TemporaryDirectory() as td:
        module = os.path.join(td, "module.mlir")
        leaf_specs = tuple(
            jax.ShapeDtypeStruct(np.shape(l), np.asarray(l).dtype)
            for l in leaves)
        if args.nv12:
            in_spec = jnp.zeros((B, fh // 2, fw, 3), jnp.uint8)
        elif args.u8:
            in_spec = jnp.zeros((B, fh, fw, 3), jnp.uint8)
        else:
            in_spec = jnp.zeros((B, nh, nw, 3), jnp.float32)
        export_stablehlo(fn, (in_spec,) + leaf_specs, module,
                         platforms=["tpu"])
        weights_bin = os.path.join(td, "weights.bin")
        n_tensors = write_weights_bin(leaves, weights_bin)
        raw = os.path.join(td, "frames.raw")
        with open(raw, "wb") as f:
            f.write(frames_u8.tobytes())
        dump_dir = os.path.join(td, "dump")
        os.makedirs(dump_dir)

        env = dict(os.environ)
        env.setdefault("PJRT_CREATE_OPTIONS",
                       axon_create_options_env(args.plugin))
        argv = [binary, args.plugin, module, str(fh), str(fw), str(nh),
                str(nw), str(B), raw, str(n_batches), weights_bin,
                dump_dir,
                "nv12" if args.nv12 else ("u8" if args.u8 else "f32"),
                str(args.depth)]
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=1800, env=env)
        print(r.stdout)
        if r.returncode != 0:
            print(r.stderr)
            raise SystemExit(r.returncode)

        # gate tiers: same-backend refs leave only jax-vs-shim compile
        # option deltas, so the gates tighten hard; the CPU fallback is a
        # cross-backend (MXU-vs-host f32) comparison and stays loose
        if ref_backend == "cpu":
            rel_tol = REL_TOL
            bad_max = 0.25 if args.bf16 else BAD_FRAC_MAX
            plate_min = 0.75 if args.bf16 else 0.9
        elif args.bf16:
            rel_tol, bad_max, plate_min = REL_TOL, BAD_FRAC_MAX, 0.95
        else:
            rel_tol = REL_TOL_SAME_BACKEND
            bad_max, plate_min = BAD_FRAC_SAME_BACKEND, 0.98

        summary = json.loads(r.stdout.strip().splitlines()[-1])
        if args.packed:
            # spans come from JointPipeline.packed_sections (static, from
            # the spec); the total must tile the exported width exactly
            packed_k = int(np.asarray(ref_batches[0][0]).shape[1])
            assert spans[-1][-1] == packed_k, (spans, packed_k)
            per_output = compare_packed(dump_dir, ref_batches, spans,
                                        rel_tol=rel_tol)
        else:
            per_output = compare_outputs(dump_dir, ref_batches, n_outputs,
                                         rel_tol=rel_tol)

    # verification verdict: float sections within tolerance on (almost)
    # every element; argmax-id sections by decoded-plate agreement
    # (element rel-err is meaningless for class ids — see
    # compare_cls_ids).
    summary["model"] = args.model
    summary["dtype"] = "bfloat16" if args.bf16 else "float32"
    summary["input"] = ("nv12" if args.nv12
                        else ("u8" if args.u8 else "f32"))
    summary["packed"] = bool(args.packed)
    summary["ref_backend"] = ref_backend
    summary["gates"] = {"rel_tol": rel_tol, "bad_frac_max": bad_max,
                        "plate_match_min": plate_min}
    summary["n_weight_tensors_expected"] = n_tensors
    summary["per_output"] = per_output
    floats = [o for o in per_output if "max_rel_err" in o]
    ids = [o for o in per_output if "plate_match" in o]
    summary["max_rel_err"] = max(o["max_rel_err"] for o in floats)
    summary["ok"] = bool(
        summary["frames"] >= n_frames
        and all(o["bad_frac"] <= bad_max for o in floats)
        and all(o.get("plate_match_confident", o["plate_match"])
                >= plate_min for o in ids))
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
