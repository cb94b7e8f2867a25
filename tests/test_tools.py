"""Tests for the tools layer: IBVS control law, dataset tooling,
path recorder."""
import math
import os

import numpy as np
import pytest

from yolo_tpu.tools.ibvs import (AzimuthFilter, IBVSController,
                                 VelocityCommand, _bound)


def make_box(score=0.9, y=0.5, x=0.5, h=0.4, w=0.5, depth=-1.0,
             azi_bin=None, num_bins=24):
    logits = np.zeros(num_bins)
    if azi_bin is not None:
        logits[azi_bin] = 8.0
    return np.concatenate([[score, y, x, h, w, depth], logits])


def test_ibvs_centred_target_small_commands():
    ctl = IBVSController(desire_z=0.0)      # z error from image height
    ctl.set_pose(0.0, 1.0)
    # target perfectly framed at the desired area -> tiny commands
    box = make_box(h=math.sqrt(0.3), w=math.sqrt(0.3), y=0.7, x=0.5,
                   azi_bin=0)
    cmd = ctl.update(box, dt=1 / 30)
    assert abs(cmd.x) <= 0.2 and abs(cmd.y) <= 0.2
    assert cmd.yaw_rate == pytest.approx(0.0, abs=1e-6)
    assert not cmd.hovering


def test_ibvs_offset_target_steers_toward_it():
    ctl = IBVSController(desire_z=0.0)
    ctl.set_pose(0.0, 1.0)
    # target far (small area) and to the left of centre
    box = make_box(h=0.1, w=0.1, x=0.3, azi_bin=0)
    cmd = ctl.update(box, dt=1 / 30)
    assert cmd.x > 0            # approach (area error positive)
    assert cmd.yaw_rate > 0     # rotate toward the target (w err = 0.5-0.3)


def test_ibvs_heading_rotation():
    """Body->world: with heading pi/2 a forward command becomes +y."""
    ctl = IBVSController(desire_z=0.0, gains={"yp": 0.0})
    ctl.set_pose(math.pi / 2, 1.0)
    box = make_box(h=0.1, w=0.1, azi_bin=0)
    cmd = ctl.update(box, dt=1 / 30)
    assert abs(cmd.x) < 1e-6
    assert cmd.y > 0.0


def test_ibvs_lost_target_hover_then_spin():
    ctl = IBVSController()
    lost = make_box(score=0.0)
    for i in range(ctl.LOSS_TARGET_MAX):
        cmd = ctl.update(lost)
        assert cmd.hovering and cmd.yaw_rate == 0.0
    cmd = ctl.update(lost)
    assert cmd.hovering and cmd.yaw_rate == pytest.approx(0.1)


def test_ibvs_depth_mode():
    ctl = IBVSController(desire_distance=1.5, desire_z=0.0)
    near = make_box(depth=1.0, azi_bin=0)   # too close -> back off
    cmd = ctl.update(near)
    assert cmd.x < 0


def test_velocity_bound_deadband():
    assert _bound(0.5, 0.2, 0.05) == 0.2
    assert _bound(-0.5, 0.2, 0.05) == -0.2
    assert _bound(0.01, 0.2, 0.05) == 0.0


def test_azimuth_filter_converges():
    f = AzimuthFilter()
    logits = np.zeros(24)
    logits[6] = 10.0   # 90 degrees
    for _ in range(5):
        ang = f.update(logits)
    assert np.degrees(ang) == pytest.approx(90.0, abs=1.0)


# ----------------------------------------------------------------------
# dataset tools
# ----------------------------------------------------------------------
def _write_img(path, color, size=(40, 30)):
    from PIL import Image
    Image.new("RGB", size, color).save(path)


def test_filter_backgrounds_without_cars(tmp_path):
    from yolo_tpu.tools.datasets import filter_backgrounds_without_cars
    imgd = tmp_path / "img"
    annd = tmp_path / "ann"
    imgd.mkdir()
    annd.mkdir()
    _write_img(str(imgd / "a.jpg"), (10, 10, 10))
    _write_img(str(imgd / "b.jpg"), (20, 20, 20))
    (annd / "a.xml").write_text(
        "<annotation><object><name>car</name></object></annotation>")
    (annd / "b.xml").write_text(
        "<annotation><object><name>tree</name></object></annotation>")
    keep = filter_backgrounds_without_cars(str(imgd), str(annd))
    assert keep == ["b.jpg"]


def test_compose_and_pack(tmp_path):
    from PIL import Image
    from yolo_tpu.tools.datasets import (compose_detection_dataset,
                                         labels_to_list_file,
                                         pack_image_pool)
    bgd = tmp_path / "bg"
    crd = tmp_path / "crops"
    outd = tmp_path / "out"
    bgd.mkdir()
    crd.mkdir()
    for i in range(2):
        _write_img(str(bgd / f"bg{i}.jpg"), (30 * i, 80, 120), (128, 96))
    crop = Image.new("RGBA", (24, 16), (200, 0, 0, 255))
    crop.save(crd / "car0.png")
    n = compose_detection_dataset(str(outd), str(bgd), str(crd),
                                  per_image=2, size_hw=(96, 128))
    assert n == 2
    assert sorted(os.listdir(outd))[:2] == ["00000.jpg", "00000.txt"]
    rows = (outd / "00000.txt").read_text().strip().split("\n")
    assert len(rows) == 2
    vals = [float(v) for v in rows[0].split()]
    assert len(vals) == 5 and 0 <= vals[1] <= 1

    count = labels_to_list_file(str(outd), str(tmp_path / "list.lst"))
    assert count == 2

    n2 = pack_image_pool(str(outd), str(tmp_path / "pool.npy"),
                         size_hw=(64, 96))
    pool = np.load(tmp_path / "pool.npy")
    assert pool.shape == (n2, 64, 96, 3) and pool.dtype == np.uint8

    # BackgroundPool loads the shard
    from yolo_tpu.render import BackgroundPool
    import jax
    bp = BackgroundPool(str(tmp_path / "pool.npy"), 64, 96)
    out = bp.sample(jax.random.PRNGKey(0), 3)
    assert out.shape == (3, 64, 96, 3)


@pytest.mark.slow
def test_freiburg_valid_nima_fixture(tmp_path):
    """Exercise the Freiburg `valid_Nima` parse/metric/report path on a
    synthetic 2-car fixture in the dataset's file format
    (annotations/<i>_annot.txt lines '<img>\\t<l u r d>\\t<azi>',
    reference car/YOLO.py:684-838) — no real dataset needed."""
    import jax
    from types import SimpleNamespace
    from PIL import Image
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.tools.freiburg import (run_valid_nima,
                                         run_valid_nima_plot)

    root = tmp_path / "freiburg"
    (root / "annotations").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for car_i, frames in ((1, 2), (2, 2)):
        lines = []
        for f in range(frames):
            name = f"car{car_i}_f{f}"
            img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
            Image.fromarray(img).save(root / f"{name}.png")
            lines.append(f"{name}.png\t100 80 400 300\t{90 + 30 * f}\n")
        (root / "annotations" / f"{car_i}_annot.txt").write_text(
            "".join(lines))

    spec = builtin_spec("car_v1").replace(
        size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    args = SimpleNamespace(version=str(tmp_path / "v_test"), weight=None,
                           bf16=0, batch=0, record=0, backgrounds=None,
                           car_assets=None, freiburg=str(root))
    result_dir = run_valid_nima("car", spec, args)
    assert result_dir is not None
    outs = sorted(os.listdir(result_dir))
    assert outs == ["1_annot", "2_annot"]
    for annot in outs:
        lines = (
            open(os.path.join(result_dir, annot)).read().splitlines())
        assert len(lines) == 2
        cols = lines[0].split(" ")
        assert cols[0].endswith(".png")
        iou, azi_label = float(cols[1]), float(cols[2])
        assert -1.0 <= iou <= 1.0      # untrained net: any overlap value
        assert -180.0 <= azi_label <= 180.0

    # summary/plot pass parses the records without error
    res = run_valid_nima_plot(args, filter_index=())
    assert res is not None


def test_record_path(tmp_path):
    from yolo_tpu.tools.record_path import plot_path
    track = [(0, 0, ""), (1, 0, "AYM0231"), (2, 0, "AYM0231"), (3, 0, "X")]
    ratio = plot_path(track, "AYM0231", str(tmp_path / "p.png"))
    assert ratio == pytest.approx(0.5)
    assert (tmp_path / "p.png").exists()


# ---------------------------------------------------------------------
# PX4/MAVROS offboard adapter (tools/offboard.py)
# ---------------------------------------------------------------------
def test_offboard_velocity_forward_and_staleness():
    from yolo_tpu.tools.offboard import (HOVER, MODE_VELOCITY,
                                         OffboardStateMachine)
    sm = OffboardStateMachine()
    sm.on_fly_mode(MODE_VELOCITY)
    sm.on_twist(0.1, -0.2, 0.05, 0.3, stamp=100.0)
    kind, v = sm.setpoint_out(now=100.5)
    assert kind == "velocity" and v == (0.1, -0.2, 0.05, 0.3)
    # stale (>1 s old) -> hover (reference "Loss Command, Hovering")
    kind, v = sm.setpoint_out(now=101.5)
    assert kind == "velocity" and v == HOVER


def test_offboard_mode_and_arm_requests_throttled():
    from yolo_tpu.tools.offboard import OffboardStateMachine
    sm = OffboardStateMachine()
    assert sm.service_requests(10.0, "MANUAL", False) == \
        [("set_mode", "OFFBOARD")]
    # within 5 s: no repeat
    assert sm.service_requests(12.0, "MANUAL", False) == []
    # after the interval, offboard granted -> arm next
    assert sm.service_requests(16.0, "OFFBOARD", False) == [("arm", True)]
    assert sm.service_requests(22.0, "OFFBOARD", True) == []


def test_offboard_keyboard_and_land():
    from yolo_tpu.tools.offboard import MODE_DOWN, OffboardStateMachine
    sm = OffboardStateMachine()
    assert sm.on_key("w") and sm.on_key("up")
    assert sm.setpoint == [0.05, 0.0, 0.9]
    kind, pose = sm.setpoint_out(0.0)
    assert kind == "position" and pose == [0.05, 0.0, 0.9]
    sm.on_fly_mode(MODE_DOWN)
    assert sm.setpoint_out(0.0) == ("velocity", (0.0, 0.0, -0.2, 0.0))
    sm.on_land(True)
    assert sm.service_requests(99.0, "OFFBOARD", True) == \
        [("set_mode", "MANUAL"), ("arm", False)]
    assert sm.setpoint == [0.0, 0.0, 0.8]


@pytest.mark.slow
def test_profiler_survives_stage_failure(tmp_path, monkeypatch):
    """A crashing stage must not erase the whole profile artifact
    (round-2 lost its on-chip profile exactly this way)."""
    import json

    import yolo_tpu.pipeline as pipeline_mod
    from yolo_tpu.tools import profile_pipeline as pp

    def boom(fn, args, iters, probe):
        raise RuntimeError("synthetic stage failure")

    monkeypatch.setattr(pp, "timeit", boom)

    def no_call(self, *a, **k):
        raise RuntimeError("cost analysis disabled in test")

    monkeypatch.setattr(pipeline_mod.JointPipeline, "__call__", no_call)
    out = tmp_path / "prof.json"
    rows = pp.main(["--batch", "1", "--iters", "1", "--size", "64",
                    "--out", str(out)])
    data = json.loads(out.read_text())
    assert rows == {} and data["ms"] == {}
    assert len(data["errors"]) >= 7          # every stage recorded
    assert all("synthetic stage failure" in v
               for k, v in data["errors"].items() if k != "trace")
    assert data["partial"] is False          # main() ran to completion


def test_ocr_operating_point_host_decode_matches_decode_ocr():
    """The sweep tool re-implements decode.decode_ocr's peak rule on host
    (so one device run can be re-thresholded for free); lock the two
    implementations together at the tool's default 0.6 point."""
    import numpy as np
    import jax.numpy as jnp

    from yolo_tpu.decode import decode_ocr, peaks_to_text
    from yolo_tpu.ops.math import sigmoid
    from yolo_tpu.tools.ocr_operating_point import text_at

    rng = np.random.default_rng(7)
    score_logits = rng.normal(0.5, 2.0, (16, 24)).astype(np.float32)
    class_logits = rng.normal(0.0, 1.0, (16, 24, 34)).astype(np.float32)

    dec = decode_ocr(jnp.asarray(score_logits), jnp.asarray(class_logits))
    s = np.asarray(sigmoid(jnp.asarray(score_logits)))
    cls = class_logits.argmax(-1)
    for i in range(16):
        assert text_at(s[i], cls[i], 0.6) == peaks_to_text(dec.peak_cls[i])


@pytest.mark.slow
def test_ocr_operating_point_end_to_end(tmp_path):
    """Tiny end-to-end run of the operating-point sweep on random-init
    weights: artifact schema + counts must be consistent (accuracy is
    meaningless at random init — only the plumbing is under test)."""
    import json as _json

    import numpy as np

    from yolo_tpu.config import builtin_spec
    from yolo_tpu.tools import ocr_operating_point as oop
    from yolo_tpu.train import make_task
    from yolo_tpu.train.checkpoint import save_checkpoint

    # random-init checkpoints in the packaged-weights layout
    import jax
    for name, spec in (("lp", "lp_v2"), ("ocr", "ocr_v1")):
        task = make_task(name, builtin_spec(spec))
        v = task.init_variables(jax.random.PRNGKey(0))
        save_checkpoint(str(tmp_path / name), v, step=0)

    out = tmp_path / "oop.json"
    oop.main(["--lp", str(tmp_path / "lp"), "--ocr", str(tmp_path / "ocr"),
              "--batches", "1", "--batch", "2",
              "--thresholds", "0.5,0.6", "--out", str(out)])
    d = _json.loads(out.read_text())
    assert d["samples"] == 2
    assert set(d["sweep"]) == {"0.5", "0.6"}
    assert d["failures_at_0.6"] == (d["failures_peak_count"]
                                    + d["failures_substitution"])
    for v in d["sweep"].values():
        assert 0.0 <= v["exact"] <= 1.0 and 0.0 <= v["char"] <= 1.0
