"""Fused-cascade tests: the detector->unwarp->OCR program must compile as
one jitted function and produce geometrically consistent outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import builtin_spec
from yolo_tpu.pipeline import (ALPRPipeline, JointPipeline, align_up,
                               pad_frames_to)
from yolo_tpu.train import make_task

# whole-cascade compiles are multi-minute on CPU
pytestmark = pytest.mark.slow


def tiny_lp_spec():
    return builtin_spec("lp_v2").replace(
        size=[64, 96], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2, 2])


def tiny_ocr_spec():
    return builtin_spec("ocr_v1").replace(
        size=[160, 384], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2])


def tiny_carlp_spec():
    return builtin_spec("carlp_v1").replace(
        size=[64, 128],
        layers=[1, 1, 1, 1, 1, 1],
        channels=[4, 8, 8, 16, 16, 32, 32])


def test_resolve_warp_impl():
    """Default is the A/B-winning matmul unwarp; the spec key overrides;
    anything else fails fast (a typo must not silently run gather)."""
    from yolo_tpu.pipeline import resolve_warp_impl
    assert resolve_warp_impl(None) == "matmul"
    assert resolve_warp_impl(None, builtin_spec("carlp_v1")) == "matmul"
    spec = builtin_spec("carlp_v1").replace(warp_impl="gather")
    assert resolve_warp_impl(None, spec) == "gather"
    assert resolve_warp_impl("gather", spec) == "gather"
    with pytest.raises(ValueError):
        resolve_warp_impl("matmull")


def test_pad_frames():
    x = jnp.ones((2, 30, 40, 3))
    y = pad_frames_to(x, (64, 96), fill=0.0)
    assert y.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(float(jnp.sum(y)), 2 * 30 * 40 * 3)
    assert align_up(416, 64) == 448


def test_alpr_pipeline_shapes():
    lp_task = make_task("lp", tiny_lp_spec())
    ocr_task = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    lp_vars = lp_task.init_variables(k)
    ocr_vars = ocr_task.init_variables(k)
    pipe = ALPRPipeline(lp_task, ocr_task)
    f = pipe.jit()
    frames = jax.random.uniform(k, (2, 64, 96, 3))
    res = f(lp_vars, ocr_vars, frames)
    assert res.lp.shape == (2, 7)
    assert res.corners.shape == (2, 4, 2)
    assert res.crops.shape == (2, 160, 384, 3)
    assert res.ocr_scores.shape == (2, 24)
    assert res.ocr_cls.shape == (2, 24)
    # score is a sigmoid
    assert 0.0 <= float(res.lp[0, 0]) <= 1.0
    # pose ranges: Z decoded in mm scale, rotations bounded by r_max
    assert np.all(np.abs(np.asarray(res.lp[:, 4:])) <=
                  np.radians([45, 60, 45]) + 1e-5)


def test_joint_pipeline_with_padding():
    joint_task = make_task("carlp", tiny_carlp_spec())
    ocr_task = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(1)
    jv = joint_task.init_variables(k)
    ov = ocr_task.init_variables(k)
    pipe = JointPipeline(joint_task, ocr_task)
    f = pipe.jit()
    # feed frames smaller than the network input: on-device letterbox
    frames = jax.random.uniform(k, (2, 48, 80, 3))
    res = f(jv, ov, frames)
    assert res.car.shape == (2, 6 + 74)
    assert res.lp.shape == (2, 7)
    assert res.crops.shape == (2, 160, 384, 3)
    # azimuth slot is a finite angle
    assert np.all(np.abs(np.asarray(res.car[:, 5])) <= np.pi + 1e-5)


def test_joint_pipeline_depth_fusion():
    """With an aligned depth map, car slot 5 must carry the depth at the
    detected box centre (reference car/video_node.py:235-243) in both
    argmax and top-k serving modes; without depth it stays azimuth."""
    joint_task = make_task("carlp", tiny_carlp_spec())
    ocr_task = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(2)
    jv = joint_task.init_variables(k)
    ov = ocr_task.init_variables(k)
    frames = jax.random.uniform(k, (2, 64, 96, 3))
    # depth plane whose value encodes the pixel row: depth[y, x] = y
    depth = jnp.tile(jnp.arange(64, dtype=jnp.float32)[None, :, None],
                     (2, 1, 96))

    for topk in (0, 3):
        pipe = JointPipeline(joint_task, ocr_task, topk=topk)
        f = pipe.jit()
        res = f(jv, ov, frames, depth=depth)
        car = np.asarray(res.car)
        if topk:
            cy = (car[..., 2] + car[..., 4]) * 0.5
        else:
            cy = car[..., 1]
        expect = np.clip((cy * 64).astype(np.int32), 0, 63)
        np.testing.assert_allclose(car[..., 5], expect, atol=1e-5)
        # default path unchanged: azimuth in slot 5
        res0 = f(jv, ov, frames)
        assert np.all(np.abs(np.asarray(res0.car[..., 5])) <= np.pi + 1e-5)


def test_pipeline_is_one_program():
    """The cascade must lower to a single XLA computation (no host hops)."""
    lp_task = make_task("lp", tiny_lp_spec())
    ocr_task = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(0)
    lp_vars = lp_task.init_variables(k)
    ocr_vars = ocr_task.init_variables(k)
    pipe = ALPRPipeline(lp_task, ocr_task)
    frames = jnp.zeros((1, 64, 96, 3))
    lowered = jax.jit(pipe.__call__).lower(lp_vars, ocr_vars, frames)
    text = lowered.as_text()
    assert "func.func public @main" in text


def test_unwarp_consistency_with_renderer():
    """Render a plate at a known pose, unwarp with that pose's corners:
    the crop must look like a plate (bright, with dark ink)."""
    from yolo_tpu.ops.geometry import PlateProjector, unwarp_plate
    from yolo_tpu.render import LPRenderer

    r = LPRenderer(320, 512)
    bg = jnp.zeros((1, 320, 512, 3))
    imgs, labels = r.add(jax.random.PRNGKey(3), bg, (30., 30., 30.),
                         add_rate=1.0)
    pose = jnp.asarray(labels[0, 0, 1:7])
    proj = PlateProjector()
    corners = proj.corners_in_image(pose, (320, 512))
    crop = unwarp_plate(imgs[0], corners, (160, 384))
    c = np.asarray(crop)
    assert c.mean() > 0.35              # mostly white plate
    assert c.min() < 0.4                # some ink
    # ink confined to the glyph band rows (35..125 of 160)
    assert c[0:20].mean() > c[40:120].mean()


def test_joint_pipeline_topk_multi_object():
    """Multi-object serving: a JointPipeline built with topk>0 runs a
    2-car rendered scene through the SAME single program and returns
    (B, k, 6+C) NMS-kept rows (VERDICT #5 serving leg; the reference's
    argmax predict could only ever report one vehicle, car/YOLO.py:584)."""
    from yolo_tpu.render import (CarRenderer, procedural_backgrounds,
                                 procedural_car_assets)

    joint_task = make_task("carlp", tiny_carlp_spec())
    ocr_task = make_task("ocr", tiny_ocr_spec())
    k = jax.random.PRNGKey(4)
    jv = joint_task.init_variables(k)
    ov = ocr_task.init_variables(k)

    # real 2-object frames from the car renderer
    spec = joint_task.spec
    classes = spec.classes
    assets = procedural_car_assets(num_azi=4, num_ele=1, variants=1)
    r = CarRenderer(spec.size[0], spec.size[1], classes, pool=assets)
    bg = procedural_backgrounds(jax.random.PRNGKey(5), 2,
                                spec.size[0], spec.size[1])
    frames, labels = jax.jit(
        lambda kk, b: r.render(kk, b, render_rate=1.0, num_obj=2))(
            jax.random.PRNGKey(6), bg)
    assert labels.shape[1] == 2          # two objects per scene

    pipe = JointPipeline(joint_task, ocr_task, topk=4)
    res = pipe.jit()(jv, ov, frames)
    C = len(classes)
    assert res.car.shape == (2, 4, 6 + C)
    car = np.asarray(res.car)
    # rows are [score, l, t, r, b, azi, logits...]: scores are sigmoids
    # (suppressed rows zeroed), azimuth slot is a finite angle
    assert ((car[..., 0] >= 0.0) & (car[..., 0] <= 1.0)).all()
    assert (np.abs(car[..., 5]) <= np.pi + 1e-5).all()
    # the LP/OCR legs keep their single-plate shapes
    assert res.lp.shape == (2, 7)
    assert res.ocr_cls.shape == (2, 24)


def test_pad_frames_downscales_larger():
    """Frames larger than the canvas letterbox (aspect-preserving
    downscale + pad) instead of trace-erroring."""
    from yolo_tpu.pipeline import letterbox_geometry
    x = jnp.ones((1, 480, 640, 3))
    y = pad_frames_to(x, (64, 96), fill=0.0)
    assert y.shape == (1, 64, 96, 3)
    sh, sw, dy, dx = letterbox_geometry((480, 640), (64, 96))
    assert sh == 64 and sw == 85          # scale = min(64/480, 96/640)
    assert dy == 0 and dx == 5
    # content occupies exactly the letterboxed region
    np.testing.assert_allclose(float(jnp.sum(y)), sh * sw * 3, rtol=1e-5)


def test_to_frame_coords_identity_and_padded():
    from yolo_tpu.pipeline import _to_frame_coords
    car = jnp.asarray([[0.9, 0.5, 0.5, 0.25, 0.5, 0.1, 1.0]])
    corners = jnp.asarray([[[224., 224.], [100., 224.],
                            [100., 100.], [224., 100.]]])
    # identity when frame == canvas
    c2, k2 = _to_frame_coords(car, corners, (448, 448), (448, 448), 0)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(car))
    np.testing.assert_allclose(np.asarray(k2), np.asarray(corners))
    # 416 frames centre-padded onto 448: dy = dx = 16
    c2, k2 = _to_frame_coords(car, corners, (416, 416), (448, 448), 0)
    # canvas centre (0.5 * 448 = 224 px) -> frame px 208 -> frac 0.5
    np.testing.assert_allclose(float(c2[0, 1]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(c2[0, 2]), 0.5, atol=1e-6)
    # sizes scale by canvas/frame
    np.testing.assert_allclose(float(c2[0, 3]), 0.25 * 448 / 416,
                               atol=1e-6)
    # corners shift by the pad offset (scale 1 when only padded)
    np.testing.assert_allclose(np.asarray(k2[0, 0]), [208., 208.],
                               atol=1e-5)
    # topk LTRB rows map the same way
    rows = jnp.asarray([[[0.9, 0.25, 0.25, 0.75, 0.75, 0.1, 1.0]]])
    c3, _ = _to_frame_coords(rows, corners, (416, 416), (448, 448), 1)
    np.testing.assert_allclose(float(c3[0, 0, 1]),
                               (0.25 * 448 - 16) / 416, atol=1e-6)
    np.testing.assert_allclose(float(c3[0, 0, 4]),
                               (0.75 * 448 - 16) / 416, atol=1e-6)


def test_video_node_respects_max_batches():
    """Sinks must receive exactly max_batches batches (the drain used to
    deliver one extra in-flight batch)."""
    from yolo_tpu.serve.video import VideoNode

    class ArraySource:
        def __iter__(self):
            for i in range(8):
                yield np.full((8, 8, 3), i / 8.0, np.float32)

    seen = []
    node = VideoNode(jax.jit(lambda f: jnp.mean(f)), batch=1,
                     sinks=[lambda i, r, f: seen.append(i)])
    stats = node.run(ArraySource(), max_batches=3)
    assert stats["batches"] == 3
    assert seen == [0, 1, 2]
