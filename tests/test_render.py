"""Tests for the on-device synthetic renderers."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.geometry import PlateProjector
from yolo_tpu.render import (BackgroundPool, CarRenderer, LPRenderer,
                             procedural_backgrounds, procedural_car_assets)
from yolo_tpu.render.fonts import build_glyph_atlas
from yolo_tpu.render.lp import PLATE_H, PLATE_W, SLOT_X
from yolo_tpu.targets import assign_ocr_targets


def test_glyph_atlas_shapes():
    atlas = build_glyph_atlas()
    assert atlas.glyphs.shape == (34, 90, 45)
    assert atlas.glyphs.max() > 0.5            # ink present
    # glyphs are distinct
    flat = atlas.glyphs.reshape(34, -1)
    assert len({tuple(np.round(g[:50], 2)) for g in flat}) > 20


def test_draw_plates_and_spans():
    r = LPRenderer(320, 512)
    key = jax.random.PRNGKey(0)
    chars = r.sample_chars(key, 4)
    assert chars.shape == (4, 7)
    c = np.asarray(chars)
    assert ((c[:, :3] >= 10) & (c[:, :3] < 34)).all()
    assert ((c[:, 3:] >= 0) & (c[:, 3:] <= 9)).all()
    assert not (c[:, 3:] == 4).any()           # digit 4 excluded

    inks = r.draw_plates(chars)
    assert inks.shape == (4, PLATE_H, PLATE_W)
    ink = np.asarray(inks[0])
    # ink only in the glyph band
    assert ink[:20].sum() == 0 and ink[130:].sum() == 0
    assert ink[35:125, SLOT_X[0]:SLOT_X[0] + 45].sum() > 10

    spans = r.char_spans(chars)
    assert spans.shape == (4, 7, 3)
    np.testing.assert_allclose(spans[0, 0, 1], SLOT_X[0] / PLATE_W)


def test_lpd_add_scene():
    r = LPRenderer(160, 256)
    key = jax.random.PRNGKey(1)
    bg = procedural_backgrounds(jax.random.PRNGKey(2), 4, 160, 256)
    imgs, labels = r.add(key, bg, (45.0, 60.0, 45.0), add_rate=1.0)
    assert imgs.shape == (4, 160, 256, 3)
    assert labels.shape == (4, 1, 10)
    lab = np.asarray(labels)
    assert (lab[:, 0, 0] == 1).all()
    assert ((lab[:, 0, 3] >= 1500) & (lab[:, 0, 3] <= 5000)).all()
    # projected centre within (roughly) the image
    assert ((lab[:, 0, 7] > -256) & (lab[:, 0, 7] < 512)).all()
    # plates actually changed the pixels
    assert float(jnp.mean(jnp.abs(imgs - bg))) > 1e-3

    # centre pixel of the plate should be bright (white plate)
    for i in range(4):
        x, y = int(lab[i, 0, 7]), int(lab[i, 0, 8])
        if 4 <= x < 252 and 4 <= y < 156:
            patch = np.asarray(imgs[i, y - 3:y + 3, x - 3:x + 3])
            assert patch.mean() > 0.25


def test_lpd_add_rate_zero():
    r = LPRenderer(160, 256)
    bg = procedural_backgrounds(jax.random.PRNGKey(3), 2, 160, 256)
    imgs, labels = r.add(jax.random.PRNGKey(4), bg, (45., 60., 45.),
                         add_rate=0.0)
    np.testing.assert_allclose(np.asarray(imgs), np.asarray(bg), atol=1e-5)
    assert (np.asarray(labels) == -1).all()


def test_ocr_render_labels_align_with_targets():
    r = LPRenderer(160, 384)
    bg = procedural_backgrounds(jax.random.PRNGKey(5), 4, 160, 384)
    imgs, labels = r.render(jax.random.PRNGKey(6), bg)
    assert imgs.shape == (4, 160, 384, 3)
    assert labels.shape == (4, 7, 3)
    lab = np.asarray(labels)
    assert ((lab[..., 1] > -0.2) & (lab[..., 2] < 1.2)).all()
    assert (lab[..., 2] > lab[..., 1]).all()   # right > left
    t = assign_ocr_targets(labels, area=24)
    # every plate has 7 characters -> several active columns
    assert (np.asarray(t.score) > 0).sum() >= 4 * 7


def test_plate_visible_in_ocr_render():
    r = LPRenderer(160, 384)
    bg = jnp.zeros((1, 160, 384, 3))
    imgs, labels = r.render(jax.random.PRNGKey(7), bg)
    # white plate on black background: mean brightness must jump
    assert float(imgs.mean()) > 0.2


def test_procedural_backgrounds_range():
    bgs = procedural_backgrounds(jax.random.PRNGKey(0), 3, 64, 96)
    assert bgs.shape == (3, 64, 96, 3)
    assert float(bgs.min()) >= 0.0 and float(bgs.max()) <= 1.0
    # images differ from each other
    assert float(jnp.mean(jnp.abs(bgs[0] - bgs[1]))) > 0.01


def test_background_pool_fallback():
    pool = BackgroundPool(None, 64, 96)
    out = pool.sample(jax.random.PRNGKey(1), 2)
    assert out.shape == (2, 64, 96, 3)


def test_car_renderer():
    assets = procedural_car_assets(num_azi=8, num_ele=1)
    classes = [[k * 15.0, 0.0] for k in range(24)]
    r = CarRenderer(160, 256, classes, pool=assets)
    bg = procedural_backgrounds(jax.random.PRNGKey(8), 4, 160, 256)
    f = jax.jit(lambda k, b: r.render(k, b, render_rate=1.0))
    imgs, labels = f(jax.random.PRNGKey(9), bg)
    assert imgs.shape == (4, 160, 256, 3)
    assert labels.shape == (4, 1, 30)
    lab = np.asarray(labels)
    assert (lab[:, 0, 0] >= 0).all()
    # boxes normalised and inside-ish
    assert ((lab[:, 0, 1] > 0) & (lab[:, 0, 1] < 1)).all()
    assert ((lab[:, 0, 3] > 0.02) & (lab[:, 0, 3] < 1.5)).all()
    # distribution sums to 1
    np.testing.assert_allclose(lab[:, 0, 6:].sum(-1), 1.0, atol=1e-4)
    # car pixels present
    assert float(jnp.mean(jnp.abs(imgs - bg))) > 1e-3


def test_car_renderer_multi_object():
    """num_obj slots each carry an independent label; composed pixels
    of a later slot occlude an earlier one (paste order = slot order)."""
    assets = procedural_car_assets(num_azi=4, num_ele=1, variants=1)
    classes = [[k * 15.0, 0.0] for k in range(24)]
    r = CarRenderer(160, 256, classes, pool=assets)
    bg = procedural_backgrounds(jax.random.PRNGKey(1), 6, 160, 256)
    f = jax.jit(lambda k, b: r.render(k, b, render_rate=1.0, num_obj=3))
    imgs, labels = f(jax.random.PRNGKey(2), bg)
    assert labels.shape == (6, 3, 30)
    lab = np.asarray(labels)
    assert (lab[:, :, 0] >= 0).all()           # all slots filled
    # distinct boxes per slot (same sprite pool, independent placement)
    assert not np.allclose(lab[:, 0, 1:5], lab[:, 1, 1:5])
    np.testing.assert_allclose(lab[:, :, 6:].sum(-1), 1.0, atol=1e-4)
    # render_rate=0 leaves every slot empty and the image untouched
    imgs0, labels0 = jax.jit(
        lambda k, b: r.render(k, b, render_rate=0.0, num_obj=2))(
            jax.random.PRNGKey(3), bg)
    assert (np.asarray(labels0) == -1).all()
    np.testing.assert_allclose(np.asarray(imgs0), np.asarray(bg),
                               atol=1e-5)


def test_car_sprites_azimuth_distinguishable():
    """The 3D sprites must differ between azi and 180-azi (the round-2
    flat sprites were identical there, which capped learnable azimuth
    accuracy at ~45 deg MAE)."""
    pool = procedural_car_assets(num_azi=8, num_ele=1, variants=1)
    view = np.degrees(np.asarray(pool.view)[:, 1])
    rgba = np.asarray(pool.rgba)
    a45 = rgba[np.argmin(np.abs(view - 45.0))]
    a135 = rgba[np.argmin(np.abs(view - 135.0))]
    diff = np.abs(a45 - a135).mean()
    assert diff > 0.01, f"mirror views visually identical (diff={diff})"
    a0 = rgba[np.argmin(np.abs(view - 0.0))]
    a180 = rgba[np.argmin(np.abs(view - 180.0))]
    assert np.abs(a0 - a180).mean() > 0.005    # head vs tail lights


def test_car_label_distribution_peak():
    from yolo_tpu.render.car import great_circle_label_dist
    classes = np.asarray([[k * 15.0, 0.0] for k in range(24)], np.float32)
    cls_azi = jnp.asarray(np.radians(classes[:, 0]))
    cls_ele = jnp.asarray(np.radians(classes[:, 1]))
    idx, dist = great_circle_label_dist(0.0, math.radians(45.0),
                                        cls_ele, cls_azi)
    assert int(idx) == 3                        # 45° bin
    d = np.asarray(dist)
    assert d.argmax() == 3
    np.testing.assert_allclose(d.sum(), 1.0, atol=1e-5)
    # neighbours get symmetric mass
    np.testing.assert_allclose(d[2], d[4], rtol=1e-4)


def test_plate_projection_lands_at_label_centre():
    """The rendered plate's warped alpha must cover the labelled centre."""
    r = LPRenderer(320, 512)
    key = jax.random.PRNGKey(10)
    bg = jnp.zeros((2, 320, 512, 3))
    imgs, labels = r.add(key, bg, (30.0, 30.0, 30.0), add_rate=1.0)
    lab = np.asarray(labels)
    proj = PlateProjector()
    for i in range(2):
        pose = lab[i, 0, 1:7]
        corners = np.asarray(proj.corners_in_image(jnp.asarray(pose),
                                                   (320, 512)))
        cx, cy = corners.mean(0)
        if 10 <= cx < 500 and 10 <= cy < 310:
            patch = np.asarray(imgs[i, int(cy) - 4:int(cy) + 4,
                                    int(cx) - 4:int(cx) + 4])
            assert patch.mean() > 0.15


def test_render_cascade_crops():
    """Cascade-matched OCR data: crops must look like (imperfectly
    rectified) plates; labels track the DISPLACED glyphs, not the
    canonical slots (the unwarp rectifies the noisy pose, so the
    true-pose glyphs land shifted in the crop)."""
    r = LPRenderer(320, 512)
    bg = procedural_backgrounds(jax.random.PRNGKey(20), 2, 320, 512)
    crops, labels = r.render_cascade(jax.random.PRNGKey(21), bg,
                                     (30., 30., 30.), pose_noise=0.5)
    assert crops.shape == (2, 160, 384, 3)
    assert labels.shape == (2, 7, 3)
    c = np.asarray(crops)
    # plate fills most of the strip: bright overall, ink present
    assert c.mean() > 0.25
    assert c.min() < 0.45
    lab = np.asarray(labels)
    assert (lab[..., 0] >= 0).all()
    # noisy pose -> spans must deviate from the canonical slots
    canon = np.asarray(r.char_spans(jnp.zeros((2, 7), jnp.int32)))
    assert np.abs(lab[..., 1:] - canon[..., 1:]).max() > 0.01
    # spans keep left < right and plausible glyph widths
    w = lab[..., 2] - lab[..., 1]
    assert (w > 0).all() and w.max() < 0.5


def test_render_cascade_zero_noise_labels_canonical():
    """pose_noise=0: the remapping is exactly the identity, so labels
    must equal the canonical plate-fraction spans."""
    r = LPRenderer(320, 512)
    bg = procedural_backgrounds(jax.random.PRNGKey(30), 2, 320, 512)
    _, labels = r.render_cascade(jax.random.PRNGKey(31), bg,
                                 (30., 30., 30.), pose_noise=0.0)
    canon = np.asarray(r.char_spans(jnp.zeros((2, 7), jnp.int32)))
    np.testing.assert_allclose(np.asarray(labels)[..., 1:],
                               canon[..., 1:], atol=1e-4)


def test_render_cascade_zero_noise_matches_truth_unwarp():
    """With pose_noise=0 the crop equals the true-pose rectification."""
    from yolo_tpu.ops.batched_geometry import (project_corners_batched,
                                               unwarp_plates_batched)
    r = LPRenderer(320, 512)
    bg = jnp.zeros((1, 320, 512, 3))
    crops, labels = r.render_cascade(jax.random.PRNGKey(22), bg,
                                     (20., 20., 20.), pose_noise=0.0)
    c = np.asarray(crops[0])
    # glyph band rows darker than the border rows (readable plate)
    assert c[40:120].mean() < c[:20].mean()
