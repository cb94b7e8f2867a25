"""Tests for target assignment and loss semantics, checked against
hand-computed reference math (car/YOLO.py:401-498,
LP_detection.py:259-313/354-360, OCR/OCR.py:77-118)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import builtin_spec
from yolo_tpu.losses import (huber_loss, logistic_loss, score_weight,
                             softmax_ce_loss, softmax_ce_sparse)
from yolo_tpu.ops.math import inv_sigmoid, sigmoid
from yolo_tpu.targets import (CarTargetAssigner, assign_lp_targets,
                              assign_ocr_targets)


# ----------------------------------------------------------------------
# losses
# ----------------------------------------------------------------------
def test_logistic_loss_values():
    pred = jnp.asarray([[0.0, 2.0, -2.0]])
    label = jnp.asarray([[1.0, 1.0, 0.0]])
    got = logistic_loss(pred, label)
    exp = np.mean([math.log(2), math.log(1 + math.exp(-2)),
                   math.log(1 + math.exp(-2))])
    np.testing.assert_allclose(got[0], exp, rtol=1e-5)


def test_huber_loss_regions():
    pred = jnp.asarray([[0.5, 3.0]])
    label = jnp.zeros((1, 2))
    got = huber_loss(pred, label)
    exp = np.mean([0.5 * 0.25, 1.0 * (3.0 - 0.5)])
    np.testing.assert_allclose(got[0], exp, rtol=1e-6)


def test_softmax_ce_dense_and_sparse_agree():
    logits = jnp.asarray([[[1.0, 2.0, 0.5]]])
    onehot = jnp.asarray([[[0.0, 1.0, 0.0]]])
    dense = softmax_ce_loss(logits, onehot)
    sparse = softmax_ce_sparse(logits, jnp.asarray([[1]]))
    np.testing.assert_allclose(dense, sparse, rtol=1e-6)


def test_weighting_reduction_matches_gluon():
    # gluon multiplies the elementwise weight then means over non-batch axes
    pred = jnp.zeros((2, 4, 1))
    label = jnp.ones((2, 4, 1))
    w = jnp.asarray([1.0, 0.0, 0.0, 0.0]).reshape(1, 4, 1)
    got = logistic_loss(pred, label, w)
    np.testing.assert_allclose(got, math.log(2) / 4, rtol=1e-5)


def test_score_weight():
    mask = jnp.asarray([[0.0, 1.0]])
    w = score_weight(mask, 10.0, 0.1)
    np.testing.assert_allclose(w, [[0.1, 10.0]])


# ----------------------------------------------------------------------
# car target assignment
# ----------------------------------------------------------------------
def test_car_assignment_centre_box():
    spec = builtin_spec("car_v1")
    assigner = CarTargetAssigner(spec)
    # a box exactly matching anchor 0 of level 0, centred on cell (0, 0)
    h0, w0 = spec.all_anchors[0][0]
    cy, cx = 8.0 / 320, 8.0 / 512
    label = np.full((1, 1, 6 + spec.num_class), 0.0, np.float32)
    label[0, 0, 0] = 3            # class index irrelevant; >= 0 -> valid
    label[0, 0, 1:5] = [cy, cx, h0, w0]
    label[0, 0, 5] = 0.25         # rotation
    label[0, 0, 6:] = 1.0 / spec.num_class
    t = jax.jit(assigner)(jnp.asarray(label))

    assert t.mask.shape == (1, 840, 3, 1)
    np.testing.assert_allclose(np.sum(np.asarray(t.mask)), 1.0)
    # the hit is cell 0 / anchor 0
    assert float(t.mask[0, 0, 0, 0]) == 1.0
    # centre on the cell centre -> sigmoid(t) == 0.5 -> t == 0
    np.testing.assert_allclose(t.box_yx[0, 0, 0], [0.0, 0.0], atol=1e-4)
    # exact anchor match -> log(1) == 0
    np.testing.assert_allclose(t.box_hw[0, 0, 0], [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(t.rotate[0, 0, 0, 0], 0.25, atol=1e-6)


def test_car_assignment_encoding_roundtrip():
    spec = builtin_spec("car_v1")
    assigner = CarTargetAssigner(spec)
    label = np.full((1, 1, 6 + spec.num_class), 0.0, np.float32)
    cy, cx, h, w = 0.52, 0.47, 0.33, 0.41
    label[0, 0, 0] = 0
    label[0, 0, 1:5] = [cy, cx, h, w]
    t = assigner(jnp.asarray(label))
    idx = np.unravel_index(np.argmax(np.asarray(t.mask)), t.mask.shape)
    b, cell, anc, _ = idx
    g = assigner.grids
    step = float(g.step[cell, anc, 0])
    ctr_y = (float(assigner.ltrb[cell, anc, 1]) +
             float(assigner.ltrb[cell, anc, 3])) / 2
    ctr_x = (float(assigner.ltrb[cell, anc, 0]) +
             float(assigner.ltrb[cell, anc, 2])) / 2
    # decode the stored targets back to the box (the predict() transform,
    # car/YOLO.py:552-566)
    ty, tx = np.asarray(t.box_yx[b, cell, anc])
    th, tw = np.asarray(t.box_hw[b, cell, anc])
    by = sigmoid(ty) * step / 320 + (ctr_y - step / 320 / 2)
    bx = sigmoid(tx) * step / 512 + (ctr_x - step / 512 / 2)
    bh = math.exp(th) * float(g.h[cell, anc, 0])
    bw = math.exp(tw) * float(g.w[cell, anc, 0])
    np.testing.assert_allclose([by, bx, bh, bw], [cy, cx, h, w], atol=1e-3)


def test_car_assignment_multi_object():
    """Two objects in distinct cells both assign; two objects claiming the
    SAME (cell, anchor) resolve to the later one (the reference loop's
    overwrite semantics, car/YOLO.py:466-480)."""
    spec = builtin_spec("car_v1")
    assigner = CarTargetAssigner(spec)
    h0, w0 = spec.all_anchors[0][0]

    # distinct cells: far-apart centres
    label = np.full((1, 2, 6 + spec.num_class), 0.0, np.float32)
    label[0, 0, 0] = 1
    label[0, 0, 1:5] = [8.0 / 320, 8.0 / 512, h0, w0]
    label[0, 1, 0] = 2
    label[0, 1, 1:5] = [0.7, 0.7, h0, w0]
    t = assigner(jnp.asarray(label))
    assert float(jnp.sum(t.mask)) == 2.0

    # same cell: identical boxes, different rotation payloads -> last wins
    label[0, 1, 1:5] = label[0, 0, 1:5]
    label[0, 0, 5] = 0.111
    label[0, 1, 5] = 0.999
    t = assigner(jnp.asarray(label))
    assert float(jnp.sum(t.mask)) == 1.0
    cell_rot = float(jnp.sum(t.rotate))
    np.testing.assert_allclose(cell_rot, 0.999, atol=1e-6)

    # invalid second object must not steal the slot from a valid first
    label[0, 1, 0] = -1.0
    t = assigner(jnp.asarray(label))
    assert float(jnp.sum(t.mask)) == 1.0
    np.testing.assert_allclose(float(jnp.sum(t.rotate)), 0.111, atol=1e-6)


def test_car_assignment_invalid_label():
    spec = builtin_spec("car_v1")
    assigner = CarTargetAssigner(spec)
    label = np.full((2, 1, 6 + spec.num_class), -1.0, np.float32)
    t = assigner(jnp.asarray(label))
    assert float(jnp.sum(t.mask)) == 0.0
    assert float(jnp.sum(jnp.abs(t.box_yx))) == 0.0


# ----------------------------------------------------------------------
# LP target assignment
# ----------------------------------------------------------------------
def test_lp_assignment():
    r_max = [45, 60, 45]
    label = np.full((1, 1, 10), -1.0, np.float32)
    X, Y, Z = 300.0, -150.0, 2500.0
    r = [0.3, -0.5, 0.2]
    x_px, y_px = 300.0, 170.0
    label[0, 0] = [1, X, Y, Z, r[0], r[1], r[2], x_px, y_px, 2]
    t = assign_lp_targets(jnp.asarray(label), (10, 16), (320, 512), r_max)
    assert t.score.shape == (1, 10, 16, 1)
    hf, wf = int(170 // 32), int(300 // 32)
    assert float(t.score[0, hf, wf, 0]) == 1.0
    np.testing.assert_allclose(np.sum(np.asarray(t.score)), 1.0)
    np.testing.assert_allclose(t.pose_xy[0, hf, wf], [0.3, -0.15], atol=1e-6)
    np.testing.assert_allclose(t.pose_z[0, hf, wf, 0], 2.5, atol=1e-6)
    # rotation encode/decode roundtrip (decode: LP_detection.py:156-161)
    for i in range(3):
        enc = float(t.pose_r[0, hf, wf, i])
        dec = (float(sigmoid(enc)) - 0.5) * 2 * r_max[i] * math.pi / 180
        np.testing.assert_allclose(dec, r[i], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.cls[0, hf, wf]), [0, 0, 1])


def test_lp_assignment_empty():
    label = np.full((3, 1, 10), -1.0, np.float32)
    t = assign_lp_targets(jnp.asarray(label), (10, 16), (320, 512),
                          [45, 60, 45])
    assert float(jnp.sum(t.score)) == 0.0


# ----------------------------------------------------------------------
# LP corner-reprojection loss (opt-in scale: LP_corner)
# ----------------------------------------------------------------------
def _lp_out_encoding_targets(t, gh, gw):
    """Head map whose pose channels at the GT cell decode to the GT pose."""
    out = np.zeros((t.score.shape[0], gh, gw, 10), np.float32)
    out[..., 1:3] = np.asarray(t.pose_xy)
    out[..., 3:4] = np.asarray(t.pose_z)
    out[..., 4:7] = np.asarray(t.pose_r)
    return jnp.asarray(out)


def test_lp_corner_loss_zero_at_truth_positive_off_truth():
    from yolo_tpu.config import Spec
    from yolo_tpu.train.tasks import _lp_corner_loss
    spec = Spec({"LP_r_max": [45, 60, 45]})
    label = np.full((1, 1, 10), -1.0, np.float32)
    label[0, 0] = [1, 300.0, -150.0, 2500.0, 0.3, -0.5, 0.2,
                   300.0, 170.0, 2]
    labels = jnp.asarray(label)
    t = assign_lp_targets(labels, (10, 16), (320, 512), spec.LP_r_max)
    out = _lp_out_encoding_targets(t, 10, 16)
    loss = float(_lp_corner_loss(out, t.mask, labels, spec, 1.0))
    assert loss < 1e-5
    # +500 mm Z error at the GT cell must reproject corners off
    out_off = out + t.mask * np.asarray(
        [0, 0, 0, 0.5, 0, 0, 0, 0, 0, 0], np.float32)
    loss_off = float(_lp_corner_loss(out_off, t.mask, labels, spec, 1.0))
    assert loss_off > loss + 1e-3
    g = jax.grad(lambda o: _lp_corner_loss(o, t.mask, labels, spec, 1.0))(
        out_off)
    assert np.isfinite(np.asarray(g)).all()
    # gradient flows only through the pose channels of the GT cell
    assert float(jnp.sum(jnp.abs(g * (1.0 - t.mask)))) == 0.0


def test_lp_corner_loss_invalid_label_zero_and_nan_free():
    from yolo_tpu.config import Spec
    from yolo_tpu.train.tasks import _lp_corner_loss
    spec = Spec({"LP_r_max": [45, 60, 45]})
    labels = jnp.asarray(np.full((2, 1, 10), -1.0, np.float32))
    t = assign_lp_targets(labels, (10, 16), (320, 512), spec.LP_r_max)
    # raw zeros decode to Z = 0 mm: the in-loss clamp must keep the
    # projection's divide-by-z finite even though the weight is 0
    out = jnp.zeros((2, 10, 16, 10), jnp.float32)
    loss = float(_lp_corner_loss(out, t.mask, labels, spec, 1.0))
    assert loss == 0.0
    g = jax.grad(lambda o: _lp_corner_loss(o, t.mask, labels, spec, 1.0))(
        out)
    assert np.isfinite(np.asarray(g)).all()


# ----------------------------------------------------------------------
# OCR target assignment
# ----------------------------------------------------------------------
def test_ocr_targets_single_char():
    # one char spanning columns [6, 12): centre 0.375, width 0.25
    labels = np.full((1, 7, 3), -1.0, np.float32)
    labels[0, 0] = [5, 0.25, 0.5]
    t = assign_ocr_targets(jnp.asarray(labels), area=24)
    assert t.score.shape == (1, 1, 24, 1)
    s = np.asarray(t.score[0, 0, :, 0])
    c = np.asarray(t.cls[0, 0])
    for i in range(24):
        if 6 <= i < 12:
            box_cent = (i + 0.5) / 24.0
            exp = 1 - abs(box_cent - 0.375) / 0.25
            np.testing.assert_allclose(s[i], exp, rtol=1e-5)
            assert c[i] == 5
        else:
            assert s[i] == 0.0 and c[i] == -1


def test_ocr_targets_full_plate():
    # 7 chars evenly spaced, as draw_LP produces
    labels = np.full((1, 7, 3), -1.0, np.float32)
    xs = [7, 56, 106, 175, 225, 274, 324]
    for j, x in enumerate(xs):
        labels[0, j] = [j + 10, x / 380.0, (x + 45) / 380.0]
    t = assign_ocr_targets(jnp.asarray(labels), area=24)
    c = np.asarray(t.cls[0, 0])
    present = sorted(set(int(v) for v in c if v >= 0))
    assert present == list(range(10, 17))


def test_ocr_task_loss_shapes_and_learning_signal():
    """Regression: the OCR class loss must pair each column with ITS OWN
    label (a silent broadcast once averaged every column against every
    label and plateaued training)."""
    import jax.numpy as jnp
    from yolo_tpu.config import builtin_spec
    from yolo_tpu.train import make_task

    spec = builtin_spec("ocr_v1").replace(
        size=[64, 96], num_init_features=8, growth_rate=4,
        block_config=[2, 2, 2])
    task = make_task("ocr", spec)
    variables = task.init_variables(jax.random.PRNGKey(0))

    # one char spanning columns [0, 6) of 6 -> class 7
    labels = np.full((2, 7, 3), -1.0, np.float32)
    labels[:, 0] = [7, 0.0, 1.0]
    images = jnp.zeros((2, 64, 96, 3))

    loss_fn = lambda p: task.loss(  # noqa: E731
        p, variables["batch_stats"], images, jnp.asarray(labels))
    total, (parts, _) = loss_fn(variables["params"])
    assert np.isfinite(float(total))

    # perfect logits must give a much smaller class loss than wrong ones
    from yolo_tpu.losses import softmax_ce_sparse
    area = 96 // 16
    cls = jnp.full((2, 1, area), 7, jnp.int32)
    score = jnp.ones((2, 1, area, 1))
    good = jnp.zeros((2, 1, area, 34)).at[..., 7].set(20.0)
    bad = jnp.zeros((2, 1, area, 34)).at[..., 3].set(20.0)
    lg = float(jnp.mean(softmax_ce_sparse(good, cls, weight=score)))
    lb = float(jnp.mean(softmax_ce_sparse(bad, cls, weight=score)))
    assert lg < 1e-3 and lb > 5.0
    # shape sanity: per-sample loss vector
    assert softmax_ce_sparse(good, cls, weight=score).shape == (2,)
