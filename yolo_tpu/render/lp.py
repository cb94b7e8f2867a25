"""On-device synthetic licence-plate rendering.

TPU-first rebuild of the reference's ``LPGenerator``
(yolo_modules/licence_plate_render/__init__.py:22-214), which drew plates
with PIL pastes and warped them per-sample on host. Here the whole batch
is produced by one jitted program:

* plate drawing = glyph-atlas gather + static-position composite
  (positions are fixed per plate type, __init__.py:28-29),
* the 6-DoF perspective projection is the same camera model
  (ops.geometry.PlateProjector), and the PIL PERSPECTIVE warp becomes a
  batched homography sampler,
* photometric augmentation is RNG-keyed jax (ops.image).

Two entry points mirror the reference API:
* ``add(key, bg)``    — project plates into scenes for LPD training
  (labels ``[valid, X, Y, Z, r1, r2, r3, x_px, y_px, type]``,
  __init__.py:134-166),
* ``render(key, bg)`` — fronto-parallel strips for OCR training
  (labels ``[cls, left, right]`` per character, __init__.py:168-214).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.geometry import (CameraIntrinsics, PlateProjector,
                                   homography_from_4pts, warp_affine,
                                   warp_perspective)
from yolo_tpu.ops.image import gaussian_blur, random_color_jitter
from yolo_tpu.render.fonts import (DOT_H, DOT_W, GLYPH_H, GLYPH_W,
                                   GlyphAtlas, build_glyph_atlas)

# Taiwanese type-0 plate geometry (ABC-1234): canvas 380x160, glyph row at
# y=35, dash at y=45, slot x positions (reference __init__.py:27-29).
PLATE_H, PLATE_W = 160, 380


def _paste_window(scene, wrgb, wa, y0, x0):
    """Alpha-blend one (wh, ww) RGBA window into a scene at (y0, x0)."""
    wh_, ww_ = wrgb.shape[0], wrgb.shape[1]
    wbg = jax.lax.dynamic_slice(scene, (y0, x0, 0), (wh_, ww_, 3))
    blend = jnp.clip(wbg * (1 - wa) + wrgb * wa, 0.0, 1.0)
    return jax.lax.dynamic_update_slice(scene, blend, (y0, x0, 0))
SLOT_X = (7, 56, 106, 175, 225, 274, 324)
DOT_X, DOT_Y = 158, 45
GLYPH_Y = 35


class LPRenderer:
    def __init__(self, img_h: int, img_w: int,
                 camera: CameraIntrinsics = CameraIntrinsics(),
                 atlas: GlyphAtlas = None, class_index: int = 1):
        self.h = int(img_h)
        self.w = int(img_w)
        self.class_index = class_index
        self.projector = PlateProjector(camera=camera)
        atlas = atlas or build_glyph_atlas()
        self.atlas = jnp.asarray(atlas.glyphs)          # (34, 90, 45)
        # pre-pad the dash into a full plate-size alpha layer (static)
        dot_layer = np.zeros((PLATE_H, PLATE_W), np.float32)
        dot_layer[DOT_Y:DOT_Y + DOT_H, DOT_X:DOT_X + DOT_W] = atlas.dot
        self.dot_layer = jnp.asarray(dot_layer)

    # ------------------------------------------------------------------
    # plate drawing
    # ------------------------------------------------------------------
    def sample_chars(self, key, batch: int):
        """(B, 7) int32 — 3 letters in [10, 34), 4 digits excluding '4'
        (reference __init__.py:67-79: digit 4 is remapped to 9)."""
        k1, k2 = jax.random.split(key)
        letters = jax.random.randint(k1, (batch, 3), 10, 34)
        digits = jax.random.randint(k2, (batch, 4), 0, 9)
        digits = jnp.where(digits == 4, 9, digits)
        return jnp.concatenate([letters, digits], axis=-1)

    def draw_plates(self, chars):
        """(B, 7) char ids -> (B, 160, 380) ink-alpha canvases.

        White plate with dark glyphs: the canvas holds ink alpha; the RGB
        plate is (1 - ink) grey-scale white.
        """
        def one(ch):
            ink = self.dot_layer
            for i, x in enumerate(SLOT_X):
                glyph = self.atlas[ch[i]]               # (90, 45)
                layer = jnp.zeros((PLATE_H, PLATE_W), glyph.dtype)
                layer = jax.lax.dynamic_update_slice(
                    layer, glyph, (GLYPH_Y, x))
                ink = jnp.maximum(ink, layer)
            return ink
        return jax.vmap(one)(chars)

    def char_spans(self, chars):
        """(B, 7, 3) [cls, left, right] normalised to plate width
        (reference label layout, __init__.py:70)."""
        B = chars.shape[0]
        left = jnp.asarray(SLOT_X, jnp.float32) / PLATE_W
        right = (jnp.asarray(SLOT_X, jnp.float32) + GLYPH_W) / PLATE_W
        left = jnp.broadcast_to(left, (B, 7))
        right = jnp.broadcast_to(right, (B, 7))
        return jnp.stack([chars.astype(jnp.float32), left, right], -1)

    # ------------------------------------------------------------------
    # LPD scene composition (reference `add`)
    # ------------------------------------------------------------------
    def sample_pose(self, key, r_max_deg: Sequence[float]):
        """6-DoF pose with the reference's distribution
        (__init__.py:97-105): Z ~ U[1500, 5000] mm, X/Y proportional to Z,
        rotations uniform within ±r_max."""
        ks = jax.random.split(key, 4)
        Z = jax.random.uniform(ks[0], (), minval=1500.0, maxval=5000.0)
        X = (Z * 9 / 30.0) * jax.random.uniform(ks[1], (), minval=-1, maxval=1)
        Y = (Z * 7 / 30.0) * jax.random.uniform(ks[2], (), minval=-1, maxval=1)
        r = jax.random.uniform(ks[3], (3,), minval=-1, maxval=1) * \
            jnp.asarray(r_max_deg) * (math.pi / 180.0)
        return jnp.concatenate([jnp.stack([X, Y, Z]), r])

    def _project_one(self, ink, pose):
        """Warp one plate (ink alpha) into the (h, w) scene via its pose.

        Output px -> camera px (resolution scale) -> plate px (homography
        from the projected corners). Returns (rgb (h,w,3), alpha (h,w,1),
        centre (x_px, y_px)).
        """
        corners = self.projector(pose)                   # (4,2) camera px
        dst = jnp.asarray([[PLATE_W, PLATE_H], [0.0, PLATE_H],
                           [0.0, 0.0], [PLATE_W, 0.0]], jnp.float32)
        H_cam2plate = homography_from_4pts(corners, dst)
        cam = self.projector.camera
        S = jnp.asarray([[cam.width / self.w, 0, 0],
                         [0, cam.height / self.h, 0],
                         [0, 0, 1]], jnp.float32)
        H_out2plate = H_cam2plate @ S

        plate_rgba = jnp.concatenate(
            [jnp.broadcast_to((1.0 - ink)[..., None], (PLATE_H, PLATE_W, 3)),
             jnp.ones((PLATE_H, PLATE_W, 1))], -1)
        warped = warp_perspective(plate_rgba, H_out2plate, (self.h, self.w))
        rgb, alpha = warped[..., :3], warped[..., 3:]
        centre = self.projector.project_center(pose, (self.h, self.w))
        return rgb, alpha, centre

    def _composite_windowed(self, bg_batch, inks, poses):
        """Warp + alpha-composite all plates into the scenes via a fixed
        window around each plate's corner bbox.

        The full-canvas warp samples every scene pixel per image; plates
        at Z >= 1500 mm never exceed ~0.65 x scene width, so restricting
        the inverse-warp gather to a window around the quad cuts the
        dominant gather cost >2x and avoids the vmapped-homography
        formulation entirely (elementwise batched coords + one flat take;
        see ops.batched_geometry).
        Returns (composited scenes, corners (B, 4, 2) scene px).
        """
        from yolo_tpu.ops.batched_geometry import (project_corners_batched,
                                                   scene_to_plate_coords)
        B, H, W, _ = bg_batch.shape
        wh = min(H, (int(0.75 * H) + 7) // 8 * 8)
        ww = min(W, (int(0.66 * W) + 7) // 8 * 8)
        corners = project_corners_batched(
            poses, self.projector.camera, (H, W))
        ox = jnp.clip(jnp.min(corners[:, :, 0], 1).astype(jnp.int32) - 4,
                      0, max(W - ww, 0))
        oy = jnp.clip(jnp.min(corners[:, :, 1], 1).astype(jnp.int32) - 4,
                      0, max(H - wh, 0))

        # plate-px coords of every window pixel (elementwise, batched)
        yy, xx = jnp.meshgrid(jnp.arange(wh, dtype=jnp.float32),
                              jnp.arange(ww, dtype=jnp.float32),
                              indexing="ij")
        pts_x = xx.reshape(-1)[None] + ox[:, None]
        pts_y = yy.reshape(-1)[None] + oy[:, None]
        px, py = scene_to_plate_coords(corners, pts_x, pts_y,
                                       (PLATE_W, PLATE_H))
        px = px.reshape(B, wh, ww)
        py = py.reshape(B, wh, ww)

        # flat batched bilinear gather from the plate RGBA pool
        plates = jnp.concatenate(
            [jnp.broadcast_to((1.0 - inks)[..., None],
                              (B, PLATE_H, PLATE_W, 3)),
             jnp.ones((B, PLATE_H, PLATE_W, 1))], -1)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        dx = (px - x0)[..., None]
        dy = (py - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        flat = plates.reshape(B * PLATE_H * PLATE_W, 4)
        base = (jnp.arange(B, dtype=jnp.int32) *
                (PLATE_H * PLATE_W))[:, None, None]

        def g4(yi, xi):
            idx = base + jnp.clip(yi, 0, PLATE_H - 1) * PLATE_W + \
                jnp.clip(xi, 0, PLATE_W - 1)
            return jnp.take(flat, idx, axis=0)

        v00 = g4(y0i, x0i)
        v01 = g4(y0i, x0i + 1)
        v10 = g4(y0i + 1, x0i)
        v11 = g4(y0i + 1, x0i + 1)
        win = ((v00 * (1 - dx) + v01 * dx) * (1 - dy) +
               (v10 * (1 - dx) + v11 * dx) * dy)
        valid = ((px >= -0.5) & (px <= PLATE_W - 0.5) &
                 (py >= -0.5) & (py <= PLATE_H - 0.5))[..., None]
        win = jnp.where(valid, win, 0.0)
        return win, (oy, ox), corners

    @partial(jax.jit, static_argnums=0)
    def add(self, key, bg_batch, r_max_deg: Tuple[float, ...] = (45., 60., 45.),
            add_rate: float = 0.5):
        """Composite a random plate into each background with probability
        ``add_rate``. bg_batch: (B, h, w, 3) in [0, 1].

        Returns (images (B, h, w, 3), labels (B, 1, 10)) with label layout
        ``[valid, X, Y, Z, r1, r2, r3, x_px, y_px, LP_type]`` and -1 rows
        where no plate was added (reference __init__.py:134-166).
        """
        B, H, W, _ = bg_batch.shape
        keys = jax.random.split(key, 5)
        chars = self.sample_chars(keys[0], B)
        inks = self.draw_plates(chars)
        poses = jax.vmap(lambda k: self.sample_pose(k, r_max_deg))(
            jax.random.split(keys[1], B))

        win, (oy, ox), _corners = self._composite_windowed(
            bg_batch, inks, poses)
        rgb, alpha = win[..., :3], win[..., 3:]

        # photometric: jitter the plate pixels, light blur, sensor noise
        rgb = random_color_jitter(keys[2], rgb, brightness=0.5, contrast=0.5,
                                  saturation=0.5, hue=0.2,
                                  noise_std=5.0 / 255.0)
        sig = jax.random.uniform(keys[3], (B,), minval=0.0, maxval=1.0)
        rgb = jax.vmap(lambda im, s: gaussian_blur(im, s, radius=2))(rgb, sig)

        use = (jax.random.uniform(keys[4], (B,)) < add_rate)
        alpha = alpha * use[:, None, None, None]

        img = jax.vmap(_paste_window)(bg_batch, rgb, alpha, oy, ox)

        # projected plate centre (elementwise batched)
        cam = self.projector.camera
        cx = (poses[:, 0] * cam.fx / poses[:, 2] + cam.cx) * \
            (W / float(cam.width))
        cy = (poses[:, 1] * cam.fy / poses[:, 2] + cam.cy) * \
            (H / float(cam.height))
        centre = jnp.stack([cx, cy], -1)

        labels = jnp.concatenate([
            jnp.ones((B, 1)), poses, centre, jnp.zeros((B, 1))], -1)
        labels = jnp.where(use[:, None], labels, -jnp.ones_like(labels))
        return img, labels[:, None, :]

    # ------------------------------------------------------------------
    # cascade-matched OCR strips: scene -> (noisy-pose) unwarp
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def render_cascade(self, key, bg_batch,
                       r_max_deg: Tuple[float, ...] = (45., 60., 45.),
                       pose_noise: float = 1.0):
        """OCR training data drawn from the SERVING distribution: plates
        are projected into scenes and rectified with a *perturbed* pose —
        exactly the crops the fused LPD->unwarp->OCR cascade produces when
        the detector's pose is imperfect. ``pose_noise`` scales the
        perturbation (jitters calibrated to the trained LPD's error:
        ~100 mm XY, ~10% Z, ~0.15 rad rotation).

        Returns (crops (B, 160, 384, 3), labels (B, 7, 3)).
        The reference could not express this augmentation at all — its
        OCR only ever saw fronto-parallel synthetic strips.
        """
        from yolo_tpu.ops.batched_geometry import (plate_to_scene_coords,
                                                   project_corners_batched,
                                                   scene_to_plate_coords,
                                                   unwarp_plates_batched)
        B, H, W, _ = bg_batch.shape
        keys = jax.random.split(key, 7)
        chars = self.sample_chars(keys[0], B)
        inks = self.draw_plates(chars)
        poses = jax.vmap(lambda k: self.sample_pose(k, r_max_deg))(
            jax.random.split(keys[1], B))

        win, (oy, ox), corners_true = self._composite_windowed(
            bg_batch, inks, poses)
        rgb, alpha = win[..., :3], win[..., 3:]
        rgb = random_color_jitter(keys[2], rgb, brightness=0.5,
                                  contrast=0.5, saturation=0.5, hue=0.2,
                                  noise_std=5.0 / 255.0)

        scenes = jax.vmap(_paste_window)(bg_batch, rgb, alpha, oy, ox)

        # perturb the pose the way an imperfect detector would
        n_xy = jax.random.normal(keys[3], (B, 2)) * 100.0 * pose_noise
        n_z = poses[:, 2] * (jax.random.normal(keys[4], (B,)) * 0.08
                             * pose_noise)
        n_r = jax.random.normal(keys[5], (B, 3)) * 0.15 * pose_noise
        noisy = jnp.concatenate([
            poses[:, 0:2] + n_xy,
            (poses[:, 2] + n_z)[:, None],
            poses[:, 3:6] + n_r], -1)
        corners = project_corners_batched(
            noisy, self.projector.camera, (H, W))
        crops = unwarp_plates_batched(scenes, corners, (160, 384),
                                      sample_hw=(80, 192))
        # char spans through the SAME geometry as the crop: the unwarp
        # rectifies the NOISY quad, so the (true-pose) glyphs land
        # displaced in the crop — canonical spans would point the OCR
        # targets at the wrong columns (~3.3 of 24 columns at 1-sigma XY
        # jitter). Map each span endpoint at mid-glyph height forward
        # through the true-pose plate homography into the scene, then
        # back through the noisy-pose rectification the unwarp applied.
        spans = self.char_spans(chars)               # plate-frac [cls,l,r]
        vmid = jnp.full_like(spans[..., 1], 0.5)
        sxl, syl = plate_to_scene_coords(corners_true, spans[..., 1], vmid)
        sxr, syr = plate_to_scene_coords(corners_true, spans[..., 2], vmid)
        ul, _ = scene_to_plate_coords(corners, sxl, syl, (1, 1))
        ur, _ = scene_to_plate_coords(corners, sxr, syr, (1, 1))
        labels = jnp.stack([spans[..., 0], ul, ur], -1)
        return crops, labels

    # ------------------------------------------------------------------
    # OCR strip composition (reference `render`)
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def render(self, key, bg_batch):
        """Paste fronto-parallel plates with mild scale/shear/rotation onto
        backgrounds for OCR training. Returns (images (B, h, w, 3),
        labels (B, 7, 3) = [cls, left, right] in image-width units).

        Unlike the reference (which approximated the post-rotation char
        spans with a cos(r) formula, __init__.py:203-209), spans here are
        computed exactly by pushing the glyph endpoints through the same
        affine that renders the plate.
        """
        B = bg_batch.shape[0]
        keys = jax.random.split(key, 8)
        chars = self.sample_chars(keys[0], B)
        inks = self.draw_plates(chars)
        spans = self.char_spans(chars)                  # plate-width units

        resize = jax.random.uniform(keys[1], (B,), minval=0.9, maxval=1.0) \
            * (self.w / float(PLATE_W))                 # fit plate to strip
        hscale = jax.random.uniform(keys[2], (B,), minval=0.9, maxval=1.1)
        shear = jax.random.uniform(keys[3], (B,), minval=-0.1, maxval=0.1)
        rot = jax.random.uniform(keys[4], (B,),
                                 minval=-5.0, maxval=5.0) * math.pi / 180.0
        # random placement of the plate centre
        cx = self.w / 2 + jax.random.uniform(keys[5], (B,), minval=-0.04,
                                             maxval=0.04) * self.w
        cy = self.h / 2 + jax.random.uniform(keys[6], (B,), minval=-0.1,
                                             maxval=0.1) * self.h

        def fwd_matrix(rs, hs, sh, r, cx_, cy_):
            """plate px -> canvas px: scale, shear, rotate, translate."""
            c, s = jnp.cos(r), jnp.sin(r)
            S = jnp.asarray([[rs, rs * sh], [0.0, rs * hs]])
            R = jnp.asarray([[c, -s], [s, c]])
            M = R @ S
            centre_plate = jnp.asarray([PLATE_W / 2.0, PLATE_H / 2.0])
            t = jnp.asarray([cx_, cy_]) - M @ centre_plate
            return M, t

        def one(ink, rs, hs, sh, r, cx_, cy_, span):
            M, t = fwd_matrix(rs, hs, sh, r, cx_, cy_)
            Minv = jnp.linalg.inv(M)
            A = jnp.concatenate([Minv, (-Minv @ t)[:, None]], -1)
            rgba = jnp.concatenate(
                [jnp.broadcast_to((1.0 - ink)[..., None],
                                  (PLATE_H, PLATE_W, 3)),
                 jnp.ones((PLATE_H, PLATE_W, 1))], -1)
            warped = warp_affine(rgba, A, (self.h, self.w))
            # exact char spans: map endpoints at plate mid-glyph height
            ymid = GLYPH_Y + GLYPH_H / 2.0
            lx = M[0, 0] * span[:, 1] * PLATE_W + M[0, 1] * ymid + t[0]
            rx = M[0, 0] * span[:, 2] * PLATE_W + M[0, 1] * ymid + t[0]
            lab = jnp.stack([span[:, 0], lx / self.w, rx / self.w], -1)
            return warped[..., :3], warped[..., 3:], lab

        rgb, alpha, labels = jax.vmap(one)(
            inks, resize, hscale, shear, rot, cx, cy, spans)
        rgb = random_color_jitter(keys[7], rgb, brightness=0.5, contrast=0.5,
                                  saturation=0.3, hue=0.3,
                                  noise_std=10.0 / 255.0)
        img = jnp.clip(bg_batch * (1 - alpha) + rgb * alpha, 0.0, 1.0)
        return img, labels
