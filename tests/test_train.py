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


def test_train_step_tensor_parallel(tmp_path):
    """2-D (data, model) mesh: wide conv kernels shard their output
    channels over 'model' and the step's loss matches the pure-DP run
    (same seeds => same synthesized batch; only the reduction layout
    differs)."""
    from jax.sharding import PartitionSpec
    from yolo_tpu.parallel import model_axis_size

    spec = tiny_carlp_spec().replace(tp_min_features=16)
    assets = procedural_car_assets(num_azi=4, num_ele=1)

    def one_step(mesh, workdir):
        trainer = Trainer(make_task("carlp", spec), str(tmp_path / workdir),
                          mesh=mesh, record=False, car_assets=assets)
        step = trainer.make_step()
        bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
        return step(trainer.state, jax.random.PRNGKey(2), bg)

    tp_mesh = make_mesh(axis_names=("data", "model"), model_size=2)
    assert model_axis_size(tp_mesh) == 2
    state_tp, losses_tp = one_step(tp_mesh, "tp")
    state_dp, losses_dp = one_step(make_mesh(), "dp")

    # TP actually happened: some updated kernel is channel-sharded
    tp_specs = [x.sharding.spec for x in
                jax.tree_util.tree_leaves(state_tp.params)
                if getattr(x, "ndim", 0) == 4]
    assert any(s == PartitionSpec(None, None, None, "model")
               for s in tp_specs), tp_specs

    # and the math is the same program: losses agree with the DP run
    np.testing.assert_allclose(float(losses_tp["total"]),
                               float(losses_dp["total"]),
                               rtol=2e-4)

    # math parity under TP sharding. The well-conditioned checks are
    # tight: the eval forward is bitwise-level identical and the loss
    # agrees to reduction-order noise. Elementwise grad equality is NOT
    # well-conditioned here — BatchNorm's train-mode backward multiplies
    # epsilon-level reduction differences by 1/sigma through six stages —
    # so gradients are compared at norm level (catches wrong psum /
    # denominator bugs, which are 2x-8x, not few-percent).
    from yolo_tpu.parallel import state_sharding_tree
    task = make_task("carlp", spec)
    trainer = Trainer(task, str(tmp_path / "g"), mesh=tp_mesh,
                      record=False, car_assets=assets)
    bg = trainer.next_backgrounds(jax.random.PRNGKey(1))
    images, labels = jax.jit(trainer.synthesize)(jax.random.PRNGKey(3), bg)
    p = trainer.state.params
    bs = trainer.state.batch_stats
    p_sh = state_sharding_tree(tp_mesh, p, min_features=16)

    fwd = lambda q: task.apply_eval({"params": q, "batch_stats": bs},
                                    images)
    (car_a, lp_a) = jax.jit(fwd)(p)
    (car_b, lp_b) = jax.jit(fwd, in_shardings=(p_sh,))(p)
    for x, y in zip([*car_a, lp_a], [*car_b, lp_b]):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=1e-5)

    def gradfn(params):
        return jax.grad(
            lambda q: task.loss(q, bs, images, labels)[0])(params)

    # Control experiment (recorded r3): with NO model axis at all, the
    # same gradients computed with an 8-way vs 4-way batch split differ
    # by up to 46% in leaf norm — BN's train-mode backward chaotically
    # amplifies reduction-order noise through six stages at random
    # init. TP vs the same-split DP measured ~6%. So this bound only
    # screens for structural TP bugs (wrong psum/denominator: 2x-8x).
    from jax.sharding import NamedSharding
    repl_tree = jax.tree_util.tree_map(
        lambda _: NamedSharding(tp_mesh, PartitionSpec()), p)
    g_tp = jax.jit(gradfn, in_shardings=(p_sh,))(p)
    g_dp = jax.jit(gradfn, in_shardings=(repl_tree,))(p)
    xs = [np.asarray(x, np.float32).ravel()
          for x in jax.tree_util.tree_leaves(g_tp)]
    ys = [np.asarray(y, np.float32).ravel()
          for y in jax.tree_util.tree_leaves(g_dp)]
    # global norm is the well-conditioned aggregate (leaf-level BN noise
    # partially cancels); individual leaves get a loose screen that still
    # catches a single doubled/zeroed leaf (rel diff 1.0)
    gx, gy = np.concatenate(xs), np.concatenate(ys)
    gn = float(np.linalg.norm(gy))
    assert float(np.linalg.norm(gx - gy)) <= 0.3 * gn + 1e-6, \
        (np.linalg.norm(gx - gy), gn)
    for x, y in zip(xs, ys):
        n = float(np.linalg.norm(y))
        assert float(np.linalg.norm(x - y)) <= 0.75 * n + 1e-6, \
            (np.linalg.norm(x - y), n)


def test_synthesize_rate_knobs(tmp_path):
    """lp_add_rate / car_render_rate spec keys steer the joint synthesis:
    at rate 1.0 every scene carries a plate and a car (label slot 0
    positive), at 0.0 none do."""
    for lp_rate, car_rate in ((1.0, 1.0), (0.0, 0.0)):
        spec = tiny_carlp_spec().replace(
            lp_add_rate=lp_rate, car_render_rate=car_rate)
        trainer = Trainer(make_task("carlp", spec),
                          str(tmp_path / f"r{lp_rate}"),
                          mesh=make_mesh(), record=False,
                          car_assets=procedural_car_assets(
                              num_azi=4, num_ele=1))
        bg = trainer.backgrounds.sample(jax.random.PRNGKey(0), 8)
        _, (car_labels, lp_labels) = jax.jit(trainer.synthesize)(
            jax.random.PRNGKey(3), bg)
        lp_present = np.asarray(lp_labels[:, 0, 0] > 0)
        car_present = np.asarray(car_labels[:, 0, 0] >= 0)
        if lp_rate == 1.0:
            assert lp_present.all() and car_present.all()
        else:
            assert not lp_present.any() and not car_present.any()


def test_scene_aug_knob(tmp_path):
    """scene_noise_std / scene_brightness spec keys perturb the rendered
    scene (whole frame, not just the plate window); defaults leave the
    synthesis byte-identical to the pre-knob path."""
    base = tiny_lp_spec()
    t0 = Trainer(make_task("lp", base), str(tmp_path / "a"),
                 mesh=make_mesh(), record=False)
    imgs0, lab0 = jax.jit(t0.synthesize)(jax.random.PRNGKey(5),
                                         t0.backgrounds.sample(
                                             jax.random.PRNGKey(0), 4))
    t1 = Trainer(make_task("lp", base.replace(scene_noise_std=0.05,
                                              scene_brightness=0.3)),
                 str(tmp_path / "b"), mesh=make_mesh(), record=False)
    imgs1, lab1 = jax.jit(t1.synthesize)(jax.random.PRNGKey(5),
                                         t1.backgrounds.sample(
                                             jax.random.PRNGKey(0), 4))
    np.testing.assert_array_equal(np.asarray(lab0), np.asarray(lab1))
    diff = float(jnp.abs(imgs0 - imgs1).mean())
    assert diff > 0.01, diff
    assert float(imgs1.min()) >= 0.0 and float(imgs1.max()) <= 1.0
