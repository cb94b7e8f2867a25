"""Native framepipe tests: build, ring semantics, letterbox parity with
numpy, PPM streaming producer."""
import os
import threading
import time

import numpy as np
import pytest

from yolo_tpu.serve.native import FrameRing, load_library, native_letterbox


@pytest.fixture(scope="module")
def lib():
    lib = load_library(build=True)
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_ring_push_pop_roundtrip(lib):
    ring = FrameRing(8, 32, 48)
    frames = [np.full((32, 48, 3), i * 10, np.uint8) for i in range(3)]
    for f in frames:
        ring.push(f)
    assert ring.size == 3
    out = ring.pop_batch(3, 32, 48)
    assert out.shape == (3, 32, 48, 3)
    for i in range(3):
        np.testing.assert_allclose(out[i], frames[i] / 255.0, atol=1e-6)
    assert ring.size == 0
    ring.close()


def test_ring_pop_batch_u8_raw(lib):
    ring = FrameRing(8, 16, 24)
    frames = [np.random.default_rng(i).integers(
        0, 256, (16, 24, 3)).astype(np.uint8) for i in range(4)]
    for f in frames:
        ring.push(f)
    out = ring.pop_batch_u8(3)
    assert out.shape == (3, 16, 24, 3) and out.dtype == np.uint8
    for i in range(3):
        np.testing.assert_array_equal(out[i], frames[i])
    assert ring.size == 1
    ring.close()


def test_ring_drops_newest_when_full(lib):
    """A full ring drops the INCOMING frame: reclaiming the oldest slot
    would overwrite memory the consumer may be mid-read on (pop converts
    from slot(tail) before advancing tail) — a torn frame. The enqueued
    frames stay intact and drops are counted."""
    ring = FrameRing(2, 4, 4)
    for i in range(5):
        ring.push(np.full((4, 4, 3), i, np.uint8))
    assert ring.dropped == 3
    out = ring.pop_batch(2, 4, 4)
    assert out.shape[0] == 2
    # the two frames that fit survive, untorn and in order
    assert out[0].max() * 255 == pytest.approx(0, abs=0.5)
    assert out[-1].max() * 255 == pytest.approx(1, abs=0.5)
    # ring drained: the next push is accepted again
    ring.push(np.full((4, 4, 3), 9, np.uint8))
    out = ring.pop_batch(1, 4, 4)
    assert out[0].max() * 255 == pytest.approx(9, abs=0.5)
    ring.close()


def test_letterbox_matches_numpy(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (30, 40, 3), np.uint8)
    out = native_letterbox(img, (64, 96), fill=0.25)
    ref = np.full((64, 96, 3), 0.25, np.float32)
    dy, dx = (64 - 30) // 2, (96 - 40) // 2
    ref[dy:dy + 30, dx:dx + 40] = img / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_ring_pop_letterboxes(lib):
    ring = FrameRing(4, 30, 40)
    ring.push(np.full((30, 40, 3), 255, np.uint8))
    out = ring.pop_batch(1, 64, 96, fill=0.0)
    assert out.shape == (1, 64, 96, 3)
    assert out[0, 0, 0, 0] == 0.0                  # padding
    assert out[0, 32, 48, 0] == pytest.approx(1.0)  # pasted centre
    ring.close()


def test_ppm_stream_producer(lib, tmp_path):
    h, w = 16, 24
    path = tmp_path / "frames.ppm"
    frames = [np.full((h, w, 3), v, np.uint8) for v in (10, 100, 200)]
    with open(path, "wb") as f:
        for fr in frames:
            f.write(b"P6\n%d %d\n255\n" % (w, h))
            f.write(fr.tobytes())
    ring = FrameRing(8, h, w)
    ring.start_ppm_stream(str(path))
    deadline = time.time() + 5
    while not ring.eos and time.time() < deadline:
        time.sleep(0.01)
    out = ring.pop_batch(3, h, w)
    assert out.shape[0] == 3
    np.testing.assert_allclose(out[2], frames[2] / 255.0, atol=1e-6)
    ring.close()


def test_stalled_fifo_close_does_not_hang(lib, tmp_path):
    """A producer blocked on a FIFO with no writer must still observe
    eos (poll-based reads): close() used to join a thread stuck in a
    blocking fread forever."""
    fifo = tmp_path / "stalled.fifo"
    os.mkfifo(fifo)
    ring = FrameRing(4, 8, 8)
    ring.start_raw_stream(str(fifo))
    time.sleep(0.3)                  # let the producer block on the fifo
    t0 = time.time()
    ring.close()
    assert time.time() - t0 < 3.0


def test_stream_double_start_rejected(lib, tmp_path):
    """Starting a second producer on a live ring must be refused —
    assigning to a joinable std::thread would std::terminate."""
    path = tmp_path / "frames.raw"
    path.write_bytes(np.zeros((8, 8, 3), np.uint8).tobytes())
    ring = FrameRing(4, 8, 8)
    assert lib.fp_start_raw_stream(ring._ptr, str(path).encode()) == 1
    assert lib.fp_start_raw_stream(ring._ptr, str(path).encode()) == 0
    ring.close()


# ---------------------------------------------------------------------
# PJRT serving shim (native/pjrt_shim.cpp)
# ---------------------------------------------------------------------
def test_pjrt_shim_builds():
    from yolo_tpu.serve.native import load_pjrt_library
    lib = load_pjrt_library(build=True)
    if lib is None:
        pytest.skip("no C++ toolchain / PJRT header available")
    assert hasattr(lib, "ps_create")


@pytest.mark.skipif(
    not os.environ.get("YOLO_TPU_PJRT_PLUGIN"),
    reason="set YOLO_TPU_PJRT_PLUGIN=<plugin.so> to run the round trip "
           "(needs exclusive device access)")
def test_pjrt_roundtrip_small_model():
    """Python export -> C++ PJRT execute -> outputs match jax."""
    from yolo_tpu.tools.pjrt_roundtrip import main
    result = main(["--plugin", os.environ["YOLO_TPU_PJRT_PLUGIN"]])
    assert result["ok"], result


def test_pjrt_node_builds_and_prints_usage():
    import subprocess
    from yolo_tpu.serve.native import _NATIVE_DIR
    binary = os.path.join(_NATIVE_DIR, "pjrt_node")
    if not os.path.exists(binary):
        r = subprocess.run(["make", "-C", _NATIVE_DIR, "pjrt_node"],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("pjrt_node build unavailable")
    r = subprocess.run([binary], capture_output=True)
    assert r.returncode == 2
    assert b"usage:" in r.stderr


def test_axon_create_options_env_shape():
    from yolo_tpu.serve.native import axon_create_options_env
    s = axon_create_options_env("/opt/axon/libaxon_pjrt.so")
    assert "topology=s:" in s and "session_id=s:" in s
    assert "remote_compile=i:" in s
    # every item parses as key=<kind>:<value>
    for item in s.split(";"):
        key, rest = item.split("=", 1)
        assert rest[0] in "isb" and rest[1] == ":"
    # non-axon plugins get no options
    assert axon_create_options_env("/usr/lib/libtpu.so") == ""


def test_compare_cls_ids_peak_shift_keeps_plate():
    """A one-column peak shift flips two column entries but leaves the
    decoded plate string intact — the gate the serving verifier uses
    for argmax-id outputs (element rel-err is meaningless for ids)."""
    from yolo_tpu.tools.pjrt_node_demo import compare_cls_ids
    want = np.full((4, 8), -1, np.int32)
    want[:, 2], want[:, 5] = 7, 12
    got = want.copy()
    got[0, 2], got[0, 3] = -1, 7          # peak shifted one column right
    r = compare_cls_ids(got, want)
    assert r["plate_match"] == 1.0        # same decoded string
    assert 0 < r["col_mismatch_frac"] <= 2 / 32
    got[1, 5] = 13                        # a genuinely different char
    r = compare_cls_ids(got, want)
    assert r["plate_match"] == 0.75


def test_compare_cls_ids_borderline_vs_confident():
    """With reference scores attached, a plate whose mismatch sits at a
    near-threshold column is 'borderline' (excluded from the gated
    figure — two compiles of one program legitimately flip it), while a
    mismatch at a confident column still fails plate_match_confident."""
    from yolo_tpu.tools.pjrt_node_demo import compare_cls_ids
    want = np.full((4, 8), -1, np.int32)
    want[:, 2], want[:, 5] = 7, 12
    scores = np.full((4, 8), 0.05, np.float32)
    scores[:, 2], scores[:, 5] = 0.95, 0.95
    # plate 0: mismatch at a column whose score hugs the 0.6 threshold
    got = want.copy()
    got[0, 6] = 3
    scores[0, 6] = 0.62
    r = compare_cls_ids(got, want, scores=scores)
    assert r["plate_match"] == 0.75
    assert r["borderline_frac"] == 0.25
    assert r["plate_match_confident"] == 1.0
    # plate 1: class flip at a confidently-scored peak — no excuse
    got[1, 5] = 13
    r = compare_cls_ids(got, want, scores=scores)
    assert r["plate_match_confident"] == 2 / 3
    # near-tie with a NEIGHBOUR (not the threshold) is borderline too
    got2 = want.copy()
    got2[2, 2], got2[2, 3] = -1, 7
    scores2 = scores.copy()
    scores2[2, 3] = 0.93                  # within 0.05 of column 2's 0.95
    r = compare_cls_ids(got2, want, scores=scores2)
    assert r["borderline_frac"] == 0.0    # same decoded string, no flag
    got2[3, 2] = -1                       # peak lost at a confident col
    r = compare_cls_ids(got2, want, scores=scores2)
    assert r["plate_match_confident"] == 3 / 4


@pytest.mark.slow
def test_packed_serving_head_matches_joint_result():
    """JointPipeline.packed_call returns ONE (B, K) f32 tensor whose
    packed_sections spans slice back into the JointResult fields exactly
    (one d2h latency wave per batch on a remote transport instead of
    five). Crops must be absent."""
    import jax
    from tests.test_pipeline import tiny_carlp_spec, tiny_ocr_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.train.tasks import make_task

    joint = make_task("carlp", tiny_carlp_spec())
    ocr = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    jv, ov = joint.init_variables(k), ocr.init_variables(k)
    frames = jax.random.uniform(k, (2, 64, 96, 3))
    pipe = JointPipeline(joint, ocr)

    packed = np.asarray(jax.jit(pipe.packed_call)(jv, ov, frames))
    r = pipe.jit()(jv, ov, frames)
    spans = dict((n, (lo, hi)) for n, lo, hi in pipe.packed_sections())
    assert packed.shape == (2, pipe.packed_sections()[-1][-1])
    for name, field in [("car", r.car), ("lp", r.lp),
                        ("corners", r.corners),
                        ("ocr_scores", r.ocr_scores),
                        ("ocr_cls", r.ocr_cls)]:
        lo, hi = spans[name]
        np.testing.assert_allclose(
            packed[:, lo:hi],
            np.asarray(field, np.float32).reshape(2, -1), atol=1e-6)
    # packed width excludes crops: far smaller than one crop row
    assert packed.shape[1] < np.prod(np.asarray(r.crops).shape[1:])


@pytest.mark.slow
def test_ref_worker_matches_in_process(tmp_path):
    """The same-backend reference worker (a subprocess that computes the
    node-verification references and exits, releasing the device claim)
    must reproduce the in-process reference exactly for identical
    backend + frames — the mechanism that upgraded the node gate from a
    CPU-vs-MXU numerics measurement to a true apples-to-apples check."""
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from yolo_tpu.tools.pjrt_node_demo import letterbox_np, toy_model

    frames = (np.random.default_rng(1)
              .random((8, 96, 96, 3)) * 255).astype(np.uint8)
    fnpy = tmp_path / "frames.npy"
    np.save(fnpy, frames)
    ref = tmp_path / "ref.npz"
    # --ref-backend cpu pins the worker via jax.config (the axon plugin
    # ignores the JAX_PLATFORMS env var) — same backend as this process
    r = subprocess.run(
        [sys.executable, "-m", "yolo_tpu.tools.pjrt_node_demo",
         "--ref-worker", str(ref), "--ref-frames", str(fnpy),
         "--ref-geom", "96,96,128,128", "--ref-backend", "cpu",
         "--model", "toy", "--batch", "4", "--batches", "2"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(ref)
    fn, leaves = toy_model()
    net = letterbox_np(frames, 128, 128)
    ref_fn = jax.jit(fn)
    for b in range(2):
        want = np.asarray(ref_fn(jnp.asarray(net[b * 4:(b + 1) * 4]),
                                 *leaves)[0])
        np.testing.assert_allclose(d[f"b{b}_o0"], want, rtol=1e-6)


def test_pjrt_engine_async_api_bound():
    """The ctypes bindings expose the pipelined dispatch API (symbols
    present in the built shim; actual execution needs a plugin)."""
    from yolo_tpu.serve.native import load_pjrt_library
    lib = load_pjrt_library(build=True)
    if lib is None:
        pytest.skip("no C++ toolchain / PJRT header available")
    for sym in ("ps_execute_async", "ps_await_next", "ps_num_inflight"):
        assert hasattr(lib, sym)


@pytest.mark.slow
def test_export_serving_writes_native_artifact(tmp_path):
    """export_serving must produce everything pjrt_node consumes: a raw
    StableHLO module with a data-only (u8 frames + flat f32 weights)
    signature, a YTW1 weights.bin holding ONE flat tensor, and meta with
    the packed spans (SURVEY §2.3 tensorrt_ros role)."""
    import struct

    import jax
    from tests.test_pipeline import tiny_carlp_spec, tiny_ocr_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.serve.export import export_serving
    from yolo_tpu.train.tasks import make_task

    joint = make_task("carlp", tiny_carlp_spec())
    ocr = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    jv, ov = joint.init_variables(k), ocr.init_variables(k)
    pipe = JointPipeline(joint, ocr)

    out = export_serving(pipe, jv, ov, str(tmp_path), batch=2,
                         frame_hw=(56, 88), u8=True, platforms=["cpu"])
    assert os.path.getsize(out["module"]) > 0
    assert out["meta"]["packed_sections"] == pipe.packed_sections()
    assert out["meta"]["input"] == "u8"
    with open(out["weights"], "rb") as f:
        assert f.read(4) == b"YTW1"
        (n_tensors,) = struct.unpack("<i", f.read(4))
    assert n_tensors == 1


def test_nv12_decode_matches_numpy_reference():
    """ops.image.nv12_to_rgb must implement exactly full-range BT.601
    with nearest chroma upsampling (the host encoder's twin)."""
    import jax.numpy as jnp

    from yolo_tpu.ops.image import nv12_to_rgb, rgb_to_nv12

    rng = np.random.default_rng(3)
    nv = rng.integers(0, 256, (2, 12, 16), np.uint8)   # fh=8, fw=16
    got = np.asarray(nv12_to_rgb(jnp.asarray(nv), (8, 16)))

    y = nv[:, :8, :].astype(np.float32)
    uv = nv[:, 8:, :].reshape(2, 4, 8, 2).astype(np.float32) - 128.0
    uv = uv.repeat(2, axis=1).repeat(2, axis=2)
    r = y + 1.402 * uv[..., 1]
    g = y - 0.344136 * uv[..., 0] - 0.714136 * uv[..., 1]
    b = y + 1.772 * uv[..., 0]
    want = np.clip(np.stack([r, g, b], -1) / 255.0, 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # encoder twin round-trips chroma-flat content to ~1/255
    base = rng.integers(0, 256, (1, 4, 5, 3)).astype(np.uint8)
    img = np.repeat(np.repeat(base, 2, 1), 2, 2)
    back = np.asarray(nv12_to_rgb(jnp.asarray(rgb_to_nv12(img)),
                                  (8, 10))) * 255.0
    assert np.abs(back - img).max() < 2.0


@pytest.mark.slow
def test_serving_fn_nv12_wiring(tmp_path):
    """make_serving_fn(nv12=True) must equal packed_call on the device-
    decoded + letterboxed frames — exact wiring, no tolerance games."""
    import jax
    import jax.numpy as jnp
    from tests.test_pipeline import tiny_carlp_spec, tiny_ocr_spec
    from yolo_tpu.ops.image import nv12_to_rgb, rgb_to_nv12
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.serve.export import flatten_weights, make_serving_fn
    from yolo_tpu.train.tasks import make_task

    joint = make_task("carlp", tiny_carlp_spec())
    ocr = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    jv, ov = joint.init_variables(k), ocr.init_variables(k)
    pipe = JointPipeline(joint, ocr)
    nh, nw = pipe.spec.size
    fh, fw = nh - 8, nw - 8

    flat, unflatten = flatten_weights((jv, ov))
    fn = make_serving_fn(pipe, unflatten, u8_hw=(fh, fw), nv12=True)

    rng = np.random.default_rng(0)
    # wire shape: rank-4 (B, fh//2, fw, 3) — same linear bytes as the
    # packed planes; one ring slot of height fh/2 is one NV12 frame
    frames = rgb_to_nv12(
        rng.integers(0, 256, (2, fh, fw, 3)).astype(np.uint8)).reshape(
        2, fh // 2, fw, 3)
    got = fn(jnp.asarray(frames), jnp.asarray(flat))[0]

    rgb = nv12_to_rgb(jnp.asarray(frames).reshape(2, fh * 3 // 2, fw),
                      (fh, fw))
    dy, dx = (nh - fh) // 2, (nw - fw) // 2
    boxed = jnp.pad(rgb, ((0, 0), (dy, nh - fh - dy),
                          (dx, nw - fw - dx), (0, 0)),
                    constant_values=0.5)
    jv2, ov2 = unflatten(jnp.asarray(flat))
    want = pipe.packed_call(jv2, ov2, boxed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_serving_nv12_artifact(tmp_path):
    """nv12 export: rank-3 packed input spec + meta input tag."""
    import jax
    from tests.test_pipeline import tiny_carlp_spec, tiny_ocr_spec
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.serve.export import export_serving
    from yolo_tpu.train.tasks import make_task

    joint = make_task("carlp", tiny_carlp_spec())
    ocr = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    jv, ov = joint.init_variables(k), ocr.init_variables(k)
    pipe = JointPipeline(joint, ocr)

    out = export_serving(pipe, jv, ov, str(tmp_path), batch=2,
                         frame_hw=(56, 88), u8=True, nv12=True,
                         platforms=["cpu"])
    assert out["meta"]["input"] == "nv12"
    assert os.path.getsize(out["module"]) > 0
