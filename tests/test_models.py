"""Shape/jit tests for the model zoo, pinned to the reference operating
points (head shapes quoted in car/video_node.py comments and
LPD_video_node.py:45-47)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import builtin_spec
from yolo_tpu.models import build_model
from yolo_tpu.ops.boxes import merge_and_slice


def tiny_spec(base):
    """Shrink a spec's input so CPU tests stay fast (strides unchanged)."""
    return base.replace(size=[64 * len(base.get("layers", [1, 1, 1, 1, 1])) // 2,
                              128])


@pytest.fixture(scope="module")
def rngkey():
    return jax.random.PRNGKey(0)


def test_yolov3_head_shapes(rngkey):
    spec = builtin_spec("car_v1").replace(size=[320, 512])
    model = build_model("car", spec)
    x = jnp.zeros((1, 320, 512, 3))
    variables = model.init(rngkey, x, train=False)
    outs = model.apply(variables, x, train=False)
    # shallow-first: strides 16/32/64 -> 640/160/40 cells, 3 anchors, 30 ch
    assert [tuple(o.shape) for o in outs] == [
        (1, 640, 3, 30), (1, 160, 3, 30), (1, 40, 3, 30)]
    parts = merge_and_slice(outs, spec.slice_point)
    assert [p.shape[-1] for p in parts] == [1, 2, 2, 1, 24]


def test_carlp_head_shapes(rngkey):
    spec = builtin_spec("carlp_v1")
    model = build_model("carlp", spec)
    x = jnp.zeros((1, 320, 512, 3))
    variables = model.init(rngkey, x, train=False)
    car_outs, lp_out = model.apply(variables, x, train=False)
    assert [tuple(o.shape) for o in car_outs] == [
        (1, 640, 3, 80), (1, 160, 3, 80), (1, 40, 3, 80)]
    # LP branch at stride 16 -> 20x32 grid, 10 channels
    assert tuple(lp_out.shape) == (1, 20, 32, 10)
    assert spec.lp_grid_hw == (20, 32)


@pytest.mark.slow
def test_lp_densenet_grid(rngkey):
    spec = builtin_spec("lp_v2")
    model = build_model("lp", spec)
    x = jnp.zeros((1, 320, 512, 3))
    variables = model.init(rngkey, x, train=False)
    out = model.apply(variables, x, train=False)
    # stride 32 -> 10x16 grid, 7 + 3 channels (LPD_video_node.py:45-47)
    assert tuple(out.shape) == (1, 10, 16, 10)
    assert spec.lp_grid_hw == (10, 16)


@pytest.mark.slow
def test_ocr_densenet_columns(rngkey):
    spec = builtin_spec("ocr_v1")
    model = build_model("ocr", spec)
    x = jnp.zeros((2, 160, 384, 3))
    variables = model.init(rngkey, x, train=False)
    score, cls = model.apply(variables, x, train=False)
    # 24 columns at stride 16 (OCR/OCR.py:234)
    assert tuple(score.shape) == (2, 1, 24, 1)
    assert tuple(cls.shape) == (2, 1, 24, 34)


@pytest.mark.slow
def test_car_densenet_single_scale(rngkey):
    spec = builtin_spec("car_v11")
    model = build_model("car_dense", spec)
    x = jnp.zeros((1, 320, 512, 3))
    variables = model.init(rngkey, x, train=False)
    outs = model.apply(variables, x, train=False)
    # (1, 160, 5, 30) — reference car/YOLO.py:895 comment
    assert [tuple(o.shape) for o in outs] == [(1, 160, 5, 30)]


def test_train_mode_updates_batch_stats(rngkey):
    spec = builtin_spec("ocr_v1")
    model = build_model("ocr", spec)
    x = jax.random.uniform(rngkey, (2, 160, 384, 3))
    variables = model.init(rngkey, x, train=False)
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_jit_forward(rngkey):
    spec = builtin_spec("car_v1")
    model = build_model("car", spec)
    x = jnp.zeros((1, 64, 128, 3))   # any stride-64-aligned size works
    variables = model.init(rngkey, x, train=False)
    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    outs = f(variables, x)
    assert outs[0].shape == (1, (64 // 16) * (128 // 16), 3, 30)


def test_s2d_stem_exact_remap():
    """spec.s2d_stem + pack_stem_variables must reproduce the original
    forward EXACTLY (same arithmetic, repacked layout — models/s2d.py).
    This is the no-retraining contract: trained checkpoints convert."""
    import jax
    import numpy as np

    from tests.test_pipeline import tiny_carlp_spec
    from yolo_tpu.models.s2d import pack_stem_variables, space_to_depth
    from yolo_tpu.train.tasks import make_task

    spec = tiny_carlp_spec()
    task = make_task("carlp", spec)
    key = jax.random.PRNGKey(7)
    variables = task.init_variables(key)
    x = jax.random.uniform(key, (2,) + tuple(spec.size) + (3,))

    car_ref, lp_ref = jax.jit(task.apply_eval)(variables, x)

    s2d_spec = spec.replace(s2d_stem=True)
    s2d_task = make_task("carlp", s2d_spec)
    s2d_vars = pack_stem_variables(variables)
    car_s2d, lp_s2d = jax.jit(s2d_task.apply_eval)(s2d_vars, x)

    for a, b in zip(car_ref, car_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_s2d),
                               rtol=2e-4, atol=2e-4)

    # packed-shape sanity: init of the s2d model matches the converted
    # tree leaf-for-leaf (shape/dtype), so checkpoints restore cleanly
    s2d_init = s2d_task.init_variables(key)
    ref_shapes = jax.tree_util.tree_map(lambda l: l.shape, s2d_init)
    got_shapes = jax.tree_util.tree_map(lambda l: l.shape, s2d_vars)
    assert ref_shapes == got_shapes

    # space_to_depth channel convention: (bi*2+bj)*C + c
    img = np.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(np.float32)
    packed = np.asarray(space_to_depth(img))
    np.testing.assert_array_equal(packed[0, 0, 0, :3], img[0, 0, 0])
    np.testing.assert_array_equal(packed[0, 0, 0, 3:6], img[0, 0, 1])
    np.testing.assert_array_equal(packed[0, 0, 0, 6:9], img[0, 1, 0])
    np.testing.assert_array_equal(packed[0, 0, 0, 9:12], img[0, 1, 1])
