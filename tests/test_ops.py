"""Unit tests for yolo_tpu.ops — math, boxes, geometry.

Geometry cases are checked against the reference's hand-expanded sympy
closed form (licence_plate_render/__init__.py:352-377, reproduced
numerically here from the published algebra, not the code) and against
OpenCV-equivalent homography behaviour.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import builtin_spec
from yolo_tpu.ops import (CameraIntrinsics, GridTables, PlateProjector,
                          anchor_ltrb_table, homography_from_4pts,
                          inv_sigmoid, iou_ltrb, ltrb_to_yxhw,
                          make_grid_tables, sigmoid, warp_perspective,
                          yxhw_to_ltrb)
from yolo_tpu.ops.boxes import level_offsets, merge_and_slice
from yolo_tpu.ops.geometry import (apply_homography, bilinear_sample,
                                   np_project_corners, unwarp_plate,
                                   warp_affine)


def test_sigmoid_roundtrip():
    t = jnp.linspace(-6, 6, 25)
    np.testing.assert_allclose(inv_sigmoid(sigmoid(t)), t, atol=1e-4)


def test_box_roundtrip():
    box = jnp.asarray([[0.5, 0.4, 0.2, 0.3]])
    np.testing.assert_allclose(ltrb_to_yxhw(yxhw_to_ltrb(box)), box, atol=1e-6)


def test_iou_identity_and_disjoint():
    label = jnp.asarray([0.5, 0.5, 0.2, 0.2])
    same = yxhw_to_ltrb(label[None])[0]
    disjoint = jnp.asarray([0.9, 0.9, 1.0, 1.0])
    ious = iou_ltrb(jnp.stack([same, disjoint]), label)
    np.testing.assert_allclose(ious[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ious[1], 0.0, atol=1e-6)


def test_iou_ltrb_label_is_yxhw_not_ltrb():
    """iou_ltrb's LABEL argument is yxhw (reference get_iou mode=2
    semantics) — passing a label already converted to ltrb silently
    computes garbage (caused eval_joint_cascade to report car IoU 0.06
    for a 0.70-IoU checkpoint, reports/eval_carlp_v4_cascade.json)."""
    rng = np.random.default_rng(7)
    yxhw = jnp.asarray(
        np.c_[rng.uniform(0.3, 0.7, (16, 2)), rng.uniform(0.1, 0.3, (16, 2))],
        jnp.float32)
    # pred == label  =>  IoU 1 exactly when the label stays yxhw
    good = jax.vmap(iou_ltrb)(yxhw_to_ltrb(yxhw), yxhw)
    np.testing.assert_allclose(good, 1.0, atol=1e-6)
    bad = jax.vmap(iou_ltrb)(yxhw_to_ltrb(yxhw), yxhw_to_ltrb(yxhw))
    assert float(jnp.max(bad)) < 0.99  # the double-convert trap is NOT IoU 1


def test_iou_half_overlap():
    label = jnp.asarray([0.5, 0.5, 0.2, 0.2])
    shifted = jnp.asarray([0.4, 0.4, 0.5, 0.6])  # half-width shift in x
    iou = iou_ltrb(shifted, label)
    # inter = 0.1 * 0.2 = 0.02; union = 0.02 + 0.04 - 0.02 = 0.04
    np.testing.assert_allclose(iou, 0.5, atol=1e-5)


def test_grid_tables_match_reference_layout():
    spec = builtin_spec("car_v1")
    assert spec.steps == [16, 32, 64]
    assert spec.areas == [640, 160, 40]
    g = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    total = sum(spec.areas)
    assert g.y.shape == (total, 3, 1)
    # first level: row-major 20x32 grid at stride 16
    np.testing.assert_allclose(g.step[0, :, 0], 16.0)
    np.testing.assert_allclose(g.y[0, 0, 0], 0.0)
    np.testing.assert_allclose(g.x[1, 0, 0], 16.0)   # second cell, next col
    np.testing.assert_allclose(g.y[32, 0, 0], 16.0)  # next row (32 cols)
    # level offsets / level ids
    off = level_offsets(spec.areas)
    assert off == [0, 640, 800]
    assert int(g.level[639]) == 0 and int(g.level[640]) == 1
    # anchors repeat per-cell
    np.testing.assert_allclose(np.asarray(g.h[0, :, 0]),
                               np.asarray(spec.all_anchors[0])[:, 0])


def test_anchor_ltrb_table_centres():
    spec = builtin_spec("car_v1")
    tbl = anchor_ltrb_table(spec.size, spec.steps, spec.all_anchors)
    assert tbl.shape == (840, 3, 4)
    # cell 0 of level 0: centre at (8/320, 8/512)
    ctr_y = (tbl[0, 0, 1] + tbl[0, 0, 3]) / 2
    ctr_x = (tbl[0, 0, 0] + tbl[0, 0, 2]) / 2
    np.testing.assert_allclose(ctr_y, 8.0 / 320, atol=1e-6)
    np.testing.assert_allclose(ctr_x, 8.0 / 512, atol=1e-6)
    h = tbl[0, 0, 3] - tbl[0, 0, 1]
    np.testing.assert_allclose(h, spec.all_anchors[0][0][0], atol=1e-6)


def test_merge_and_slice():
    a = jnp.ones((2, 4, 3, 30))
    b = jnp.zeros((2, 2, 3, 30))
    parts = merge_and_slice([a, b], [1, 3, 5, 6, 30])
    assert [p.shape[-1] for p in parts] == [1, 2, 2, 1, 24]
    assert parts[0].shape == (2, 6, 3, 1)


# ----------------------------------------------------------------------
# geometry
# ----------------------------------------------------------------------
def _reference_closed_form(pose, cam: CameraIntrinsics):
    """The hand-expanded projection the reference derived with sympy —
    re-evaluated independently to pin our rotation/corner conventions."""
    X, Y, Z, r1, r2, r3 = pose
    sin, cos = math.sin, math.cos
    a = sin(r1) * cos(r2) * 84.0
    b = sin(r1) * sin(r2) * cos(r3) * 84.0
    c = sin(r2) * 199.5
    d = sin(r3) * cos(r1) * 84.0
    e = cos(r2) * cos(r3) * 199.5
    f = sin(r1) * sin(r2) * sin(r3) * 84.0
    g = sin(r3) * cos(r2) * 199.5
    h = cos(r1) * cos(r3) * 84.0
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    ans = np.array([
        [cx * (Z + a - c) + fx * (X + b - d + e),
         cx * (Z + a + c) + fx * (X + b - d - e),
         cx * (Z - a + c) + fx * (X - b + d - e),
         cx * (Z - a - c) + fx * (X - b + d + e)],
        [cy * (Z + a - c) + fy * (Y + f + g + h),
         cy * (Z + a + c) + fy * (Y + f - g + h),
         cy * (Z - a + c) + fy * (Y - f - g - h),
         cy * (Z - a - c) + fy * (Y - f + g - h)],
        [Z + a - c, Z + a + c, Z - a + c, Z - a - c]])
    return (ans[:2] / ans[2:3]).T


@pytest.mark.parametrize("pose", [
    (0.0, 0.0, 2000.0, 0.0, 0.0, 0.0),
    (300.0, -150.0, 3000.0, 0.3, -0.5, 0.2),
    (-500.0, 200.0, 1800.0, -0.7, 0.9, -0.6),
])
def test_plate_projection_matches_reference_algebra(pose):
    proj = PlateProjector()
    ours = np.asarray(proj(jnp.asarray(pose)))
    ref = _reference_closed_form(pose, proj.camera)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-2)
    nph = np_project_corners(pose)
    np.testing.assert_allclose(nph, ref, rtol=1e-4, atol=2e-2)


def test_frontal_plate_projects_centered():
    proj = PlateProjector()
    pts = np.asarray(proj(jnp.asarray([0.0, 0.0, 2000.0, 0, 0, 0])))
    # corners symmetric about the principal point
    assert pts[0, 0] > pts[1, 0]           # right-bottom right of left-bottom
    np.testing.assert_allclose((pts[0] + pts[2]) / 2,
                               [proj.camera.cx, proj.camera.cy], atol=1e-2)


def test_homography_identity_and_inverse():
    src = jnp.asarray([[0., 0.], [1., 0.], [1., 1.], [0., 1.]])
    H = homography_from_4pts(src, src)
    np.testing.assert_allclose(np.asarray(H), np.eye(3), atol=1e-5)

    dst = jnp.asarray([[10., 5.], [50., 8.], [45., 40.], [12., 38.]])
    H = homography_from_4pts(src, dst)
    back = apply_homography(H, src)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dst), atol=1e-3)


def test_bilinear_sample_exact_and_interp():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    v = bilinear_sample(img, jnp.asarray([1.0]), jnp.asarray([2.0]))
    np.testing.assert_allclose(v[0, 0], 9.0)
    v = bilinear_sample(img, jnp.asarray([0.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(v[0, 0], 0.5)
    v = bilinear_sample(img, jnp.asarray([-5.0]), jnp.asarray([0.0]), fill=7.0)
    np.testing.assert_allclose(v[0, 0], 7.0)


def test_warp_perspective_identity():
    img = jnp.arange(24.0).reshape(4, 6, 1)
    out = warp_perspective(img, jnp.eye(3), (4, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_affine_translation():
    img = jnp.zeros((8, 8, 1)).at[2, 3, 0].set(1.0)
    A = jnp.asarray([[1.0, 0.0, 3.0], [0.0, 1.0, 2.0]])  # out->src shift
    out = warp_affine(img, A, (8, 8))
    np.testing.assert_allclose(out[0, 0, 0], 1.0, atol=1e-6)


def test_unwarp_roundtrip():
    # paint a recognizable plate-like gradient, project it into a scene via
    # a homography, then unwarp with the known corners and compare.
    oh, ow = 16, 38
    plate = (jnp.arange(ow, dtype=jnp.float32) / ow)[None, :, None]
    plate = jnp.tile(plate, (oh, 1, 3))
    corners = jnp.asarray(  # rb, lb, lt, rt — a mild perspective quad
        [[90., 70.], [20., 72.], [22., 30.], [88., 28.]])
    dst = jnp.asarray([[ow, oh], [0., oh], [0., 0.], [ow, 0.]], jnp.float32)
    Hfwd = homography_from_4pts(dst, corners)
    scene = warp_perspective(jnp.zeros((120, 120, 3)), jnp.eye(3), (120, 120))
    # render plate into the scene: scene px -> plate px
    Hback = homography_from_4pts(corners, dst)
    rendered = warp_perspective(plate, Hback, (120, 120))
    recovered = unwarp_plate(rendered, corners, (oh, ow))
    # interior should match well (edges suffer bilinear falloff)
    np.testing.assert_allclose(np.asarray(recovered[4:-4, 4:-4]),
                               np.asarray(plate[4:-4, 4:-4]), atol=0.08)


def test_projection_jit_vmap():
    proj = PlateProjector()
    poses = jnp.asarray([[0., 0., 2000., 0., 0., 0.],
                         [100., 50., 2500., 0.1, 0.2, -0.1]])
    f = jax.jit(jax.vmap(proj))
    out = f(poses)
    assert out.shape == (2, 4, 2)


def test_matmul_warp_matches_gather_warp():
    """The two-pass matmul rectification must agree with direct bilinear
    gather sampling to sub-pixel tolerance across random poses."""
    from yolo_tpu.ops.batched_geometry import (project_corners_batched,
                                               unwarp_plates_batched,
                                               unwarp_plates_matmul)
    from yolo_tpu.ops.geometry import CameraIntrinsics
    from yolo_tpu.render import LPRenderer

    r = LPRenderer(160, 256)
    bg = jnp.zeros((3, 160, 256, 3))
    imgs, labels = r.add(jax.random.PRNGKey(5), bg, (40., 50., 40.),
                         add_rate=1.0)
    poses = labels[:, 0, 1:7]
    corners = project_corners_batched(poses, CameraIntrinsics(), (160, 256))
    ref = unwarp_plates_batched(imgs, corners, (48, 120))
    got = unwarp_plates_matmul(imgs, corners, (48, 120),
                               window_hw=(96, 160))
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.mean() < 0.03
    # bulk of pixels identical; only sub-pixel edge disagreement
    assert (err < 0.1).mean() > 0.97


def test_matmul_warp_jits():
    from yolo_tpu.ops.batched_geometry import unwarp_plates_matmul
    imgs = jnp.ones((2, 64, 96, 3))
    corners = jnp.tile(jnp.asarray(
        [[[80., 50.], [20., 52.], [22., 20.], [78., 18.]]]), (2, 1, 1))
    f = jax.jit(lambda i, c: unwarp_plates_matmul(i, c, (32, 80),
                                                  window_hw=(64, 96)))
    out = f(imgs, corners)
    assert out.shape == (2, 32, 80, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_object_assign_decode_roundtrip():
    """Two planted objects -> assigner encodings -> synthetic head map ->
    decode_car_topk recovers BOTH boxes and classes (the multi-object
    path end-to-end at the ops level)."""
    import jax.numpy as jnp
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.decode import decode_car_topk
    from yolo_tpu.ops.boxes import make_grid_tables
    from yolo_tpu.targets import CarTargetAssigner

    spec = builtin_spec("car_v1")
    assigner = CarTargetAssigner(spec)
    C = spec.num_class

    def soft(idx):
        d = np.full((C,), 1e-4, np.float32)
        d[idx] = 1.0
        return d / d.sum()

    labels = np.zeros((1, 2, 6 + C), np.float32)
    labels[0, 0, :6] = [3, 0.3, 0.25, 0.25, 0.2, 0.0]
    labels[0, 0, 6:] = soft(3)
    labels[0, 1, :6] = [17, 0.7, 0.75, 0.3, 0.25, 0.0]
    labels[0, 1, 6:] = soft(17)
    t = assigner(jnp.asarray(labels))
    assert float(t.mask.sum()) == 2.0

    merged = np.full((1, assigner.total_cells, assigner.n_anchors, 30),
                     -8.0, np.float32)
    m = np.asarray(t.mask)[0, :, :, 0] > 0
    merged[0, :, :, 1:3] = np.asarray(t.box_yx)[0]
    merged[0, :, :, 3:5] = np.asarray(t.box_hw)[0]
    merged[0, :, :, 5] = np.asarray(t.rotate)[0, :, :, 0]
    merged[0, :, :, 6:] = np.log(np.asarray(t.cls)[0] + 1e-9)
    merged[0, ~m, 0] = -8.0
    merged[0, m, 0] = 8.0

    grids = make_grid_tables(spec.size, spec.steps, spec.all_anchors)
    top = np.asarray(decode_car_topk(jnp.asarray(merged), grids,
                                     spec.slice_point, spec.size, k=8))
    kept = top[0][top[0, :, 0] > 0.9]
    assert len(kept) == 2, f"expected both objects, got {len(kept)}"
    for gt in labels[0]:
        gy, gx, gh, gw = gt[1:5]
        gl, gr, gtp, gb = gx - gw / 2, gx + gw / 2, gy - gh / 2, gy + gh / 2
        best = 0.0
        best_cls = -1
        for p in kept:
            l, tp, r, b = p[1:5]
            iw = max(min(r, gr) - max(l, gl), 0)
            ih = max(min(b, gb) - max(tp, gtp), 0)
            inter = iw * ih
            iou = inter / max((r - l) * (b - tp) +
                              (gr - gl) * (gb - gtp) - inter, 1e-9)
            if iou > best:
                best, best_cls = iou, int(p[6:].argmax())
        assert best > 0.85, f"object {gt[0]} not recovered (IoU {best})"
        assert best_cls == int(gt[0])


def test_decode_car_topk_nms():
    """Multi-detection decode: row 0 reproduces the argmax decode; kept
    rows are mutually non-overlapping beyond the NMS threshold."""
    import os
    import jax.numpy as jnp
    from yolo_tpu.decode import decode_car, decode_car_topk
    from yolo_tpu.ops.boxes import iou_pairwise, make_grid_tables

    g = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "parity.npz"))
    size = (320, 512)
    anchors = [
        [[0.2216, 0.1552], [0.2144, 0.2408], [0.2825, 0.3456]],
        [[0.3959, 0.2706], [0.3703, 0.4351], [0.5708, 0.4278]],
        [[0.4345, 0.6063], [0.5584, 0.7174], [0.7448, 0.6772]]]
    grids = make_grid_tables(size, [int(s) for s in g["car_steps"]],
                             anchors)
    outs = [jnp.asarray(g[f"car_out{i}"]) for i in range(3)]
    sp = [1, 3, 5, 6, 30]

    k = 8
    thresh = 0.45
    top = np.asarray(decode_car_topk(outs, grids, sp, size, k=k,
                                     iou_thresh=thresh))
    assert top.shape == (1, k, 30)

    best = np.asarray(decode_car(outs, grids, sp, size))[0]
    # row 0 is the global argmax: same score, same box (ltrb vs yxhw)
    np.testing.assert_allclose(top[0, 0, 0], best[0], atol=1e-6)
    l, t, r, b = top[0, 0, 1:5]
    np.testing.assert_allclose(
        [(t + b) / 2, (l + r) / 2, b - t, r - l], best[1:5], atol=1e-5)

    kept = top[0][top[0, :, 0] > 0]
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            iou = float(iou_pairwise(jnp.asarray(kept[i, 1:5]),
                                     jnp.asarray(kept[j, 1:5])))
            assert iou <= thresh + 1e-6, (i, j, iou)


def test_plate_to_scene_roundtrip():
    """plate_to_scene_coords is the exact forward of
    scene_to_plate_coords: mapping plate fractions out and back is the
    identity for a generic (projective) quad."""
    from yolo_tpu.ops.batched_geometry import (plate_to_scene_coords,
                                               scene_to_plate_coords)
    # [rb, lb, lt, rt] order, a non-affine quad
    corners = jnp.asarray([[[300., 250.], [60., 240.],
                            [80., 100.], [320., 90.]],
                           [[200., 200.], [100., 210.],
                            [105., 150.], [190., 140.]]])
    u = jnp.asarray([[0.0, 0.25, 0.5, 0.9], [0.1, 0.4, 0.6, 1.0]])
    v = jnp.asarray([[0.0, 0.5, 0.5, 1.0], [0.5, 0.2, 0.8, 0.5]])
    sx, sy = plate_to_scene_coords(corners, u, v)
    ub, vb = scene_to_plate_coords(corners, sx, sy, (1, 1))
    np.testing.assert_allclose(np.asarray(ub), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(v), atol=1e-4)
    # corner check: (u,v)=(0,0) is lt, (1,1) is rb
    sx0, sy0 = plate_to_scene_coords(corners, jnp.zeros((2, 1)),
                                     jnp.zeros((2, 1)))
    np.testing.assert_allclose(
        np.stack([sx0[:, 0], sy0[:, 0]], -1), np.asarray(corners[:, 2]),
        atol=1e-4)
