"""Golden parity tests against recorded reference-math outputs.

``tests/fixtures/parity.npz`` holds input/output pairs produced by an
independent numpy transliteration of the reference's formulas
(yolo_tpu/tools/make_parity_fixtures.py — see its docstring for the
reference file:line provenance of every recorded quantity). These tests
assert the framework's jax paths reproduce them:

* PlateProjector vs the hand-expanded sympy closed form
  (licence_plate_render/__init__.py:352-377)
* decode_lp vs predict_LP (licence_plate/LP_detection.py:147-162)
* decode_car vs predict + _init_syxhw (car/YOLO.py:123-155,552-597)
* decode_ocr vs the local-peak loop (OCR/OCR.py:188-199)
* unwarp_plate vs cv2.getPerspectiveTransform + warpPerspective on the
  reference's only bundled fixture image (licence_plate/test.jpg,
  add_edges semantics at licence_plate_render/__init__.py:379-402)

Tolerances are stated in decoded units (pixels / mm / radians), not raw
logits.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.decode import decode_car, decode_lp, decode_ocr
from yolo_tpu.ops.boxes import make_grid_tables
from yolo_tpu.ops.geometry import PlateProjector, unwarp_plate

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "parity.npz")
REF_TEST_JPG = "/root/reference/licence_plate/test.jpg"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def test_plate_corner_projection_parity(golden):
    """Corner projections must match the reference closed form to well
    under a hundredth of a pixel across the full pose range."""
    proj = PlateProjector()
    for pose, ref_corners in zip(golden["poses"], golden["corners"]):
        got = np.asarray(proj(jnp.asarray(pose)))
        err = np.abs(got - ref_corners).max()
        assert err < 2e-2, (pose, err)


def test_lp_decode_parity(golden):
    got = np.asarray(decode_lp(jnp.asarray(golden["lp_map"]),
                               list(golden["lp_r_max"])))
    ref = golden["lp_pred"]
    # score (sigmoid units)
    np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-6)
    # XYZ in mm
    np.testing.assert_allclose(got[:, 1:4], ref[:, 1:4], atol=1e-2)
    # rotations in radians
    np.testing.assert_allclose(got[:, 4:7], ref[:, 4:7], atol=1e-6)


def test_car_decode_parity(golden):
    size = (320, 512)
    steps = [int(s) for s in golden["car_steps"]]
    anchors = [
        [[0.2216, 0.1552], [0.2144, 0.2408], [0.2825, 0.3456]],
        [[0.3959, 0.2706], [0.3703, 0.4351], [0.5708, 0.4278]],
        [[0.4345, 0.6063], [0.5584, 0.7174], [0.7448, 0.6772]]]
    grids = make_grid_tables(size, steps, anchors)
    outs = [jnp.asarray(golden[f"car_out{i}"]) for i in range(3)]
    got = np.asarray(decode_car(outs, grids, [1, 3, 5, 6, 30], size))
    ref = golden["car_pred"]
    assert got.shape == ref.shape
    # score
    np.testing.assert_allclose(got[:, 0], ref[:, 0], atol=1e-6)
    # y, x, h, w in normalised image units (sub-1e-5 = far below a pixel)
    np.testing.assert_allclose(got[:, 1:5], ref[:, 1:5], atol=1e-5)
    # passthrough channels (rotation raw + class logits)
    np.testing.assert_allclose(got[:, 5:], ref[:, 5:], atol=1e-5)


def test_ocr_decode_parity(golden):
    o = decode_ocr(jnp.asarray(golden["ocr_score"]),
                   jnp.asarray(golden["ocr_class"]))
    np.testing.assert_array_equal(np.asarray(o.peak_cls), golden["ocr_peaks"])


@pytest.mark.skipif(not os.path.exists(REF_TEST_JPG),
                    reason="reference fixture image not present")
def test_unwarp_matches_cv2_on_reference_image(golden):
    """The on-device perspective unwarp must reproduce the reference's
    cv2.getPerspectiveTransform + warpPerspective rectification (add_edges,
    licence_plate_render/__init__.py:388-398) on the reference's bundled
    test image, for a battery of recorded poses."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    img = np.asarray(Image.open(REF_TEST_JPG).convert("RGB"),
                     np.float32) / 255.0
    H, W = img.shape[:2]
    proj = PlateProjector()
    out_hw = (160, 380)

    checked = 0
    for pose, ref_corners in zip(golden["poses"], golden["corners"]):
        # add_edges scaling: camera-frame corners -> this image's pixels
        corners = ref_corners * np.asarray(
            [W / proj.camera.width, H / proj.camera.height], np.float32)
        # only poses whose plate lies inside the frame are meaningful
        if (corners < 0).any() or (corners[:, 0] > W - 1).any() \
                or (corners[:, 1] > H - 1).any():
            continue
        checked += 1

        lp_corner = np.float32([[out_hw[1], out_hw[0]], [0, out_hw[0]],
                                [0, 0], [out_hw[1], 0]])
        M = cv2.getPerspectiveTransform(corners.astype(np.float32),
                                        lp_corner)
        ref_crop = cv2.warpPerspective(img, M, (out_hw[1], out_hw[0]))

        got = np.asarray(unwarp_plate(jnp.asarray(img),
                                      jnp.asarray(corners), out_hw))
        # interior comparison (borders differ by half-pixel sampling
        # conventions); mean abs error under 1% of dynamic range
        diff = np.abs(got[2:-2, 2:-2] - ref_crop[2:-2, 2:-2])
        assert diff.mean() < 0.01, diff.mean()
    assert checked >= 3, f"only {checked} poses landed in frame"
