"""End-to-end training-step tests on tiny shapes: every task's fused
synth->forward->backward->update program must compile, run, reduce its own
loss, and shard over the 8-device CPU mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import builtin_spec
from yolo_tpu.parallel import make_mesh
from yolo_tpu.render import procedural_car_assets
from yolo_tpu.train import make_task
from yolo_tpu.train.trainer import Trainer

# whole-module: fused train-step compiles are the slowest things in the
# suite (CI's fast subset runs with -m "not slow")
pytestmark = pytest.mark.slow


def tiny_car_spec():
    return builtin_spec("car_v1").replace(
        size=[64, 64],
        layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32],
        batch_size=8, record_step=0, valid_step=0)


def tiny_lp_spec():
    return builtin_spec("lp_v2").replace(
        size=[64, 64], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2, 2], batch_size=8, record_step=0)


def tiny_ocr_spec():
    return builtin_spec("ocr_v1").replace(
        size=[64, 96], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2], batch_size=8, record_step=0)


def tiny_carlp_spec():
    return builtin_spec("carlp_v1").replace(
        size=[64, 64],
        layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32],
        batch_size=8, record_step=0, valid_step=0)


def _run_steps(kind, spec, tmp_path, steps=3, **kw):
    trainer = Trainer(make_task(kind, spec), str(tmp_path / kind),
                      mesh=make_mesh(), record=False, **kw)
    step = trainer.make_step()
    losses_hist = []
    bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
    state = trainer.state
    for i in range(steps):
        state, losses = step(state, jax.random.PRNGKey(2), bg)
        losses_hist.append({k: float(v) for k, v in losses.items()})
    assert int(state.step) == steps
    for rec in losses_hist:
        for k, v in rec.items():
            assert np.isfinite(v), (k, rec)
    return losses_hist


def test_lp_train_step(tmp_path):
    _run_steps("lp", tiny_lp_spec(), tmp_path)


def test_ocr_train_step(tmp_path):
    _run_steps("ocr", tiny_ocr_spec(), tmp_path)


def test_car_train_step(tmp_path):
    assets = procedural_car_assets(num_azi=4, num_ele=1)
    _run_steps("car", tiny_car_spec(), tmp_path, car_assets=assets)


def test_joint_train_step(tmp_path):
    assets = procedural_car_assets(num_azi=4, num_ele=1)
    _run_steps("carlp", tiny_carlp_spec(), tmp_path, car_assets=assets)


def test_loss_decreases_ocr(tmp_path):
    """The OCR score head on tiny shapes should show optimisation progress
    within a few dozen steps on fixed data."""
    spec = tiny_ocr_spec()
    trainer = Trainer(make_task("ocr", spec), str(tmp_path / "ocr2"),
                      mesh=make_mesh(), record=False)
    step = trainer.make_step()
    bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
    state = trainer.state
    first = None
    last = None
    for i in range(30):
        state, losses = step(state, jax.random.PRNGKey(0), bg)
        if first is None:
            first = float(losses["total"])
        last = float(losses["total"])
    assert last < first, (first, last)


def test_checkpoint_roundtrip(tmp_path):
    from yolo_tpu.train.checkpoint import (latest_checkpoint,
                                           restore_checkpoint,
                                           save_checkpoint)
    spec = tiny_ocr_spec()
    trainer = Trainer(make_task("ocr", spec), str(tmp_path / "ckpt"),
                      mesh=make_mesh(), record=False)
    step = trainer.make_step()
    bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
    state, _ = step(trainer.state, jax.random.PRNGKey(2), bg)
    ckdir = str(tmp_path / "ckpt" / "backup")
    save_checkpoint(ckdir, state, int(state.step))
    assert latest_checkpoint(ckdir) == 1

    trainer2 = Trainer(make_task("ocr", spec), str(tmp_path / "ckpt2"),
                       mesh=make_mesh(), record=False)
    restored = restore_checkpoint(ckdir, trainer2.state)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_step_sharded_over_mesh(tmp_path):
    """The batch must actually shard over all 8 virtual devices."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    spec = tiny_ocr_spec()
    trainer = Trainer(make_task("ocr", spec), str(tmp_path / "mesh"),
                      mesh=mesh, record=False)
    bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
    assert len(bg.sharding.device_set) == 8
    step = trainer.make_step()
    state, losses = step(trainer.state, jax.random.PRNGKey(2), bg)
    assert np.isfinite(float(losses["total"]))
