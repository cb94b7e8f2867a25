"""App/serving-layer tests: CLI apps end to end on tiny specs, export
round-trip, video node, k-means anchors, visualization."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from yolo_tpu.config import builtin_spec

TINY_OCR = dict(
    size=[64, 96], num_init_features=8, growth_rate=4,
    block_config=[2, 2, 2], batch_size=8, record_step=0,
    learning_rate=0.001, score_weight=0.1, class_weight=1.0,
    classes=builtin_spec("ocr_v1").classes)

TINY_LP = dict(
    size=[64, 64], num_init_features=8, growth_rate=4,
    block_config=[2, 2, 2, 2], batch_size=8, record_step=0,
    learning_rate=0.0001, LP_slice_point=[1, 3, 4, 7, 10],
    LP_positive_weight=10.0, LP_negative_weight=0.1,
    LP_r_max=[45, 60, 45], LP_num_class=3,
    loss_name=["score", "xy", "z", "r", "class"],
    scale={"LP_score": 0.1, "LP_xy": 10.0, "LP_z": 1.0, "LP_r": 0.1,
           "LP_class": 0.0})

TINY_CAR = dict(builtin_spec("car_v1").to_dict(),
                size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
                channels=[4, 8, 8, 16, 16, 32, 32],
                batch_size=8, record_step=0, valid_step=0)


def write_version(tmp_path, name, spec_dict):
    vdir = tmp_path / name
    vdir.mkdir(parents=True, exist_ok=True)
    with open(vdir / "spec.yaml", "w") as f:
        yaml.safe_dump(spec_dict, f)
    return str(vdir)


@pytest.mark.slow
def test_ocr_app_train_and_valid(tmp_path, monkeypatch):
    from yolo_tpu.apps import ocr
    monkeypatch.chdir(tmp_path)
    v = write_version(tmp_path, "vT", TINY_OCR)
    ocr.main([v, "train", "--steps", "2", "--record", "0"])
    ocr.main([v, "valid", "--record", "0"])
    out = os.listdir(os.path.join(v, "valid_out"))
    assert len(out) > 0


@pytest.mark.slow
def test_lp_app_video_synthetic(tmp_path, monkeypatch):
    from yolo_tpu.apps import lp_detection
    monkeypatch.chdir(tmp_path)
    v = write_version(tmp_path, "vL", TINY_LP)
    lp_detection.main([v, "video", "--record", "0", "--dev", "synthetic",
                       "--max-frames", "3"])


@pytest.mark.slow
def test_car_app_kmean(tmp_path, monkeypatch):
    from yolo_tpu.apps import car
    monkeypatch.chdir(tmp_path)
    v = write_version(tmp_path, "vC", TINY_CAR)
    from yolo_tpu.apps.common import make_parser
    args = make_parser("t", car.MODES).parse_args([v, "kmean"])
    from yolo_tpu.apps.runner import run_kmean
    from yolo_tpu.config import Spec
    centres = run_kmean(Spec(TINY_CAR), args, k=3, samples=100)
    assert centres.shape == (3, 2)
    assert (centres > 0).all()


def test_export_roundtrip(tmp_path, monkeypatch):
    from yolo_tpu.apps import ocr
    from yolo_tpu.serve.export import load_exported
    monkeypatch.chdir(tmp_path)
    v = write_version(tmp_path, "vE", TINY_OCR)
    ocr.main([v, "export", "--record", "0"])
    export_dir = os.path.join(v, "export")
    assert os.path.exists(os.path.join(export_dir, "model.stablehlo"))
    assert os.path.exists(os.path.join(export_dir, "meta.json"))
    with open(os.path.join(export_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "ocr"

    # rehydrate and run without the model-building code
    from yolo_tpu.config import Spec
    from yolo_tpu.train import make_task
    task = make_task("ocr", Spec(TINY_OCR))
    template = task.init_variables(jax.random.PRNGKey(0))
    fn, variables = load_exported(export_dir, template)
    score, cls = fn(variables, jnp.zeros((1, 64, 96, 3)))
    assert score.shape[2] == 96 // 16


def test_iou_kmeans_recovers_clusters():
    from yolo_tpu.tools.iou_kmeans import iou_kmeans, mean_best_iou
    rng = np.random.default_rng(0)
    true = np.asarray([[0.1, 0.1], [0.3, 0.5], [0.7, 0.6]])
    hw = np.concatenate([
        t + rng.normal(0, 0.01, (100, 2)) for t in true])
    centres = np.asarray(iou_kmeans(jnp.asarray(np.abs(hw)), 3))
    got = sorted(centres.tolist())
    exp = sorted(true.tolist())
    np.testing.assert_allclose(got, exp, atol=0.05)
    assert float(mean_best_iou(jnp.asarray(np.abs(hw)), centres)) > 0.85


def test_inference_rate_harness(capsys):
    from yolo_tpu.serve.rate import test_inference_rate as rate
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    r = rate(f, x, cycles=5, warmup=1)
    assert r > 0
    assert "Inference Rate" in capsys.readouterr().out


def test_video_node_counts_batches():
    from yolo_tpu.serve.video import FrameSource, VideoNode
    seen = []
    node = VideoNode(jax.jit(lambda f: jnp.mean(f)), batch=1,
                     sinks=[lambda i, r, fr: seen.append((i, float(r)))])
    src = FrameSource("synthetic", (64, 96), max_frames=4)
    stats = node.run(src)
    assert stats["batches"] == 4
    assert len(seen) == 4
    assert all(np.isfinite(v) for _, v in seen)


def test_sharded_video_node_spans_mesh():
    """Batched stream inference must actually shard over all 8 virtual
    devices and return per-frame results for the global batch."""
    from yolo_tpu.parallel import make_mesh
    from yolo_tpu.serve.video import FrameSource, ShardedVideoNode

    mesh = make_mesh()
    assert mesh.devices.size == 8
    shardings = []
    seen = []

    def infer(f):
        return jnp.mean(f, axis=(1, 2, 3))   # per-frame scalar

    def sink(i, r, fr):
        seen.append(np.asarray(r))

    node = ShardedVideoNode(infer, mesh, per_device_batch=2, sinks=[sink])
    assert node.batch == 16

    # capture the on-device sharding of one batch result
    frames = np.random.default_rng(0).random((16, 32, 48, 3)).astype(
        np.float32)
    out = node.infer_fn(frames)
    shardings.append(out.sharding)
    assert len(out.sharding.device_set) == 8

    src = FrameSource("synthetic", (32, 48), max_frames=32)
    stats = node.run(src)
    assert stats["batches"] == 2
    assert all(s.shape == (16,) for s in seen)


def test_viz_draw_functions():
    from yolo_tpu.utils import viz
    img = np.zeros((64, 96, 3), np.uint8)
    viz.draw_bbox(img, [0.9, 0.5, 0.5, 0.4, 0.4, 0.3], 4, use_r=True)
    assert img.sum() > 0
    img2 = np.zeros((480, 640, 3), np.uint8)
    viz.draw_plate_edges(img2, [0, 0, 2000, 0, 0, 0])
    assert img2.sum() > 0
    radar = viz.RadarProb(24, [[k * 15.0, 0.0] for k in range(24)])
    logits = np.zeros(24)
    logits[6] = 5.0       # 90° bin
    ang, rad, prob = radar.cls2ang(0.9, logits)
    np.testing.assert_allclose(np.degrees(ang), 90.0, atol=1.0)
    radar.plot(0.9, logits)
    assert radar.to_image() is not None
    radar74 = viz.RadarProb(74)
    radar74.plot3d(0.8, np.random.default_rng(0).normal(size=74))
    assert radar74.to_image() is not None


def test_freiburg_harness_gates_on_missing_dataset(tmp_path):
    from yolo_tpu.tools.freiburg import run_valid_nima_plot

    class A:
        freiburg = None
        version = "vX"
    assert run_valid_nima_plot(A()) is None


def test_distributed_helpers_single_process():
    from yolo_tpu.parallel.distributed import (global_mesh, initialize,
                                               is_primary,
                                               local_batch_slice)
    assert initialize() is False          # no coordinator -> no-op
    assert is_primary()
    mesh = global_mesh()
    assert mesh.devices.size >= 1
    assert local_batch_slice(16) == slice(0, 16)


def test_time_fn_barriers():
    from yolo_tpu.utils.profiling import time_fn
    f = jax.jit(lambda x: jnp.sum(x * 2))
    stats = time_fn(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert stats["ms_per_iter"] > 0
    assert stats["single_call_ms"] > 0


def test_make_ocr_infer_decodes():
    """The standalone OCR service node's jitted infer fn returns scores +
    peak classes for a crop batch (OcrRosNode itself needs rospy)."""
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.serve.ros_bridge import make_ocr_infer
    from yolo_tpu.train import make_task

    spec = builtin_spec("ocr_v1").replace(
        num_init_features=8, growth_rate=4, block_config=[2, 2, 2, 2])
    task = make_task("ocr", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    fn = make_ocr_infer(task, v)
    crops = jnp.zeros((1, 160, 384, 3), jnp.float32)
    scores, peaks = fn(crops)
    assert scores.shape[0] == 1 and peaks.shape == scores.shape
    assert peaks.dtype == jnp.int32


@pytest.mark.slow
def test_sharded_video_node_runs_real_pipeline():
    """weak-#6 close-out: the ACTUAL JointPipeline (reduced-width nets,
    real decode/unwarp/OCR stages) through ShardedVideoNode on the full
    8-device mesh — not a toy mean() stand-in."""
    import __graft_entry__ as graft
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.parallel import make_mesh
    from yolo_tpu.pipeline import JointPipeline
    from yolo_tpu.serve.video import FrameSource, ShardedVideoNode
    from yolo_tpu.train import make_task

    spec = graft._tiny_joint_spec(builtin_spec, batch_size=8)
    joint_task = make_task("carlp", spec)
    ocr_task = make_task("ocr", graft._tiny_ocr_spec(builtin_spec))
    key = jax.random.PRNGKey(0)
    jv = joint_task.init_variables(key)
    ov = ocr_task.init_variables(key)
    pipe = JointPipeline(joint_task, ocr_task, unwarp_sample_hw=(40, 96))

    mesh = make_mesh()
    results = []
    node = ShardedVideoNode(lambda f: pipe(jv, ov, f), mesh,
                            per_device_batch=1,
                            sinks=[lambda i, r, fr: results.append(r)])
    assert node.batch == 8
    h, w = spec.size
    stats = node.run(FrameSource("synthetic", (h, w), max_frames=8))
    assert stats["batches"] == 1
    (res,) = results
    # reduced 96-wide strip -> 12 OCR slots (full pipeline: 24)
    assert res.car.shape[0] == 8 and res.ocr_cls.shape == (8, 12)
    assert np.isfinite(np.asarray(res.car)).all()
    # the batch really spans the mesh
    out = node.infer_fn(np.zeros((8, h, w, 3), np.float32))
    assert len(out.car.sharding.device_set) == 8


def test_video_node_rgbd_pairs_feed_depth():
    """A source yielding (frame, depth) pairs must call
    infer_fn(frames, depth) with both stacked batch-leading — the
    serving-path half of the reference's ZED depth contract
    (car/video_node.py:235-243)."""
    from yolo_tpu.serve.video import VideoNode
    calls = []

    def infer(frames, depth):
        calls.append((frames.shape, depth.shape))
        return jnp.mean(frames) + jnp.mean(depth)

    node = VideoNode(infer, batch=2, sinks=[lambda i, r, fr: None])
    rng = np.random.default_rng(0)
    src = [(rng.random((32, 48, 3), np.float32).astype(np.float32),
            np.full((32, 48), float(i), np.float32)) for i in range(4)]
    stats = node.run(iter(src))
    assert stats["batches"] == 2
    assert calls == [((2, 32, 48, 3), (2, 32, 48))] * 2
