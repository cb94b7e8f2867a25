"""Evaluation harness smoke tests (untrained nets: metrics exist and are
sane ranges; trained accuracy is checked on real TPU runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import builtin_spec
from yolo_tpu.tools.evaluate import eval_car, eval_lpd, eval_ocr
from yolo_tpu.train import make_task


def test_eval_ocr_untrained():
    spec = builtin_spec("ocr_v1").replace(
        size=[160, 384], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2])
    task = make_task("ocr", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    m = eval_ocr(task, v, batches=1, batch=4)
    assert 0.0 <= m["ocr_exact_match"] <= 1.0
    assert m["samples"] == 4


def test_eval_lpd_untrained():
    spec = builtin_spec("lp_v2").replace(
        size=[160, 256], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2, 2])
    task = make_task("lp", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    m = eval_lpd(task, v, batches=1, batch=4)
    assert 0.0 <= m["lpd_corner_iou"] <= 1.0
    assert m["lpd_z_mae_mm"] >= 0


@pytest.mark.slow
def test_eval_car_untrained():
    spec = builtin_spec("car_v1").replace(
        size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    task = make_task("car", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    m = eval_car(task, v, batches=1, batch=4)
    assert 0.0 <= m["car_mean_iou"] <= 1.0
    assert 0.0 <= m["car_azimuth_mae_deg"] <= 180.0


@pytest.mark.slow
def test_eval_car_multi_untrained():
    """Multi-object eval harness runs end-to-end (2-car scenes, top-k
    NMS decode, greedy matching) and reports sane ranges."""
    from yolo_tpu.tools.evaluate import eval_car_multi
    spec = builtin_spec("car_v1").replace(
        size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    task = make_task("car", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    m = eval_car_multi(task, v, batches=1, batch=4, num_obj=2, k=4)
    assert m["gt_objects"] == 8
    assert 0.0 <= m["multi_recall"] <= 1.0
    assert m["samples"] == 4


def test_eval_cascade_untrained():
    from yolo_tpu.tools.evaluate import eval_cascade
    lp_spec = builtin_spec("lp_v2").replace(
        size=[160, 256], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2, 2])
    ocr_spec = builtin_spec("ocr_v1").replace(
        num_init_features=8, growth_rate=4, block_config=[2, 2, 2])
    lp_task = make_task("lp", lp_spec)
    ocr_task = make_task("ocr", ocr_spec)
    lv = lp_task.init_variables(jax.random.PRNGKey(0))
    ov = ocr_task.init_variables(jax.random.PRNGKey(1))
    m = eval_cascade(lp_task, lv, ocr_task, ov, batches=1, batch=2)
    assert 0.0 <= m["cascade_exact_match"] <= 1.0
    assert 0.0 <= m["cascade_corner_iou"] <= 1.0
    assert m["samples"] == 2


@pytest.mark.slow
def test_eval_joint_tiny():
    """Joint eval must produce finite car + LP metrics on a tiny net."""
    import jax
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.render import procedural_car_assets
    from yolo_tpu.tools.evaluate import eval_joint
    from yolo_tpu.train import make_task

    spec = builtin_spec("carlp_v1").replace(
        size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    task = make_task("carlp", spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    m = eval_joint(task, v, batches=1, batch=4,
                   car_assets=procedural_car_assets(num_azi=4, num_ele=1))
    for k in ("car_mean_iou", "car_azimuth_mae_deg", "lp_corner_iou",
              "lp_z_mae_mm"):
        assert np.isfinite(m[k]), m


@pytest.mark.slow
def test_eval_joint_cascade_tiny():
    """The joint-net fused-cascade eval (CarLPNet -> predicted-pose
    unwarp -> OCR text) runs end-to-end and reports sane ranges."""
    import jax
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.render import procedural_car_assets
    from yolo_tpu.tools.evaluate import eval_joint_cascade
    from yolo_tpu.train import make_task

    spec = builtin_spec("carlp_v1").replace(
        size=[64, 64], layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])
    ocr_spec = builtin_spec("ocr_v1").replace(
        num_init_features=8, growth_rate=4, block_config=[2, 2, 2])
    task = make_task("carlp", spec)
    ocr_task = make_task("ocr", ocr_spec)
    v = task.init_variables(jax.random.PRNGKey(0))
    ov = ocr_task.init_variables(jax.random.PRNGKey(1))
    m = eval_joint_cascade(
        task, v, ocr_task, ov, batches=1, batch=2,
        car_assets=procedural_car_assets(num_azi=4, num_ele=1))
    assert 0.0 <= m["cascade_exact_match"] <= 1.0
    assert 0.0 <= m["cascade_corner_iou"] <= 1.0
    for k in ("car_mean_iou", "car_azimuth_mae_deg", "cascade_z_mae_mm"):
        assert np.isfinite(m[k]), m
    assert m["samples"] == 2
