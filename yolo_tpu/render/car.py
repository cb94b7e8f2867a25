"""On-device synthetic car-scene rendering for viewpoint training.

TPU-first rebuild of the reference's ``RenderCar`` (car/render_car.py):
instead of per-sample PIL resize/rotate/paste on host, car sprites live in
a fixed-size device-resident RGBA pool and each batch is composed by one
jitted program of affine warps + alpha blends. Soft viewpoint labels use
the same great-circle Gaussian over the spec's (azi, ele) class sphere
(render_car.py:410-438).

Assets:
* ``CarAssetPool.from_directory`` ingests transparent car PNGs with the
  reference's filename contract ``*azi{1/100 deg}_ele{1/100 deg}.png``
  (render_car.py:350-357) — e.g. Blender renders — plus optional
  PASCAL3D+-style crops via an annotation callback.
* ``procedural_car_assets`` fabricates car-like silhouettes so training
  and tests run with zero external data (the reference cannot run at all
  without its private dataset disk).
"""
from __future__ import annotations

import math
import os
import re
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.geometry import warp_affine
from yolo_tpu.ops.image import random_color_jitter

ASSET_H, ASSET_W = 192, 256      # letterboxed sprite tier


class CarAssetPool(NamedTuple):
    rgba: jnp.ndarray       # (N, ASSET_H, ASSET_W, 4) in [0, 1]
    view: jnp.ndarray       # (N, 2) (elevation, azimuth) rad
    bbox: jnp.ndarray       # (N, 4) content (l, t, r, b) px in the sprite

    @staticmethod
    def from_arrays(rgba: np.ndarray, view: np.ndarray) -> "CarAssetPool":
        bbox = np.zeros((rgba.shape[0], 4), np.float32)
        for i, im in enumerate(rgba):
            ys, xs = np.nonzero(im[..., 3] > 0.05)
            if len(ys):
                bbox[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            else:
                bbox[i] = [0, 0, im.shape[1], im.shape[0]]
        return CarAssetPool(jnp.asarray(rgba), jnp.asarray(view),
                            jnp.asarray(bbox))

    @staticmethod
    def from_directory(root: str, max_images: int = 512
                       ) -> Optional["CarAssetPool"]:
        """Load ``azi####_ele####``-named transparent PNGs (centi-degrees)."""
        if not os.path.isdir(root):
            return None
        from PIL import Image
        pat = re.compile(r"azi(-?\d+).*?ele(-?\d+)", re.IGNORECASE)
        rgba, view = [], []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if not f.lower().endswith(".png"):
                    continue
                m = pat.search(f)
                if not m:
                    continue
                azi = float(m.group(1)) * math.pi / 18000.0
                ele = float(m.group(2)) * math.pi / 18000.0
                im = Image.open(os.path.join(dirpath, f)).convert("RGBA")
                im.thumbnail((ASSET_W, ASSET_H), Image.BILINEAR)
                canvas = Image.new("RGBA", (ASSET_W, ASSET_H))
                canvas.paste(im, ((ASSET_W - im.width) // 2,
                                  (ASSET_H - im.height) // 2))
                rgba.append(np.asarray(canvas, np.float32) / 255.0)
                view.append([ele, azi])
                if len(rgba) >= max_images:
                    break
            if len(rgba) >= max_images:
                break                       # stop walking, not just this dir
        if not rgba:
            return None
        return CarAssetPool.from_arrays(np.stack(rgba),
                                        np.asarray(view, np.float32))


def _box_faces(x0, x1, y0, y1, z0, z1):
    """Six (corners(4,3), outward normal) quads of an axis-aligned box."""
    c = lambda x, y, z: np.asarray([x, y, z], np.float64)  # noqa: E731
    return [
        ([c(x1, y0, z0), c(x1, y1, z0), c(x1, y1, z1), c(x1, y0, z1)],
         (1, 0, 0)),     # front (+x)
        ([c(x0, y0, z0), c(x0, y1, z0), c(x0, y1, z1), c(x0, y0, z1)],
         (-1, 0, 0)),    # rear
        ([c(x0, y1, z0), c(x1, y1, z0), c(x1, y1, z1), c(x0, y1, z1)],
         (0, 1, 0)),     # left
        ([c(x0, y0, z0), c(x1, y0, z0), c(x1, y0, z1), c(x0, y0, z1)],
         (0, -1, 0)),    # right
        ([c(x0, y0, z1), c(x1, y0, z1), c(x1, y1, z1), c(x0, y1, z1)],
         (0, 0, 1)),     # top
        ([c(x0, y0, z0), c(x1, y0, z0), c(x1, y1, z0), c(x0, y1, z0)],
         (0, 0, -1)),    # bottom
    ]


def _car_quads(rng) -> list:
    """A simple 3D car as colored quads in object space.

    Object frame: +x = forward, +y = left, +z = up, units ~meters.
    Distinct front (headlights, windshield) and rear (red taillights)
    make every azimuth visually unambiguous — the cue real Blender
    renders carry and the round-2 flat sprites lacked (their geometry
    was identical for azi and 180-azi, which is exactly the measured
    ~44 deg azimuth MAE of a front/back-confused predictor).
    """
    body = rng.uniform(0.25, 0.95, size=3)
    glass = np.asarray([0.15, 0.2, 0.3]) * rng.uniform(0.7, 1.3)
    dark = np.asarray([0.06, 0.06, 0.07])
    red = np.asarray([0.75, 0.08, 0.08])
    lamp = np.asarray([0.95, 0.92, 0.7])
    L = rng.uniform(2.0, 2.4)        # half length
    Wd = rng.uniform(0.8, 1.0)       # half width
    bh = rng.uniform(0.65, 0.8)      # body height
    ch = rng.uniform(0.5, 0.65)      # cabin height
    cab_f = rng.uniform(0.3, 0.7)    # cabin front x
    cab_r = rng.uniform(-1.8, -1.4)  # cabin rear x
    quads = []   # (corners(4,3), normal(3,), rgb(3,))
    for corners, n in _box_faces(-L, L, -Wd, Wd, 0.0, bh):
        quads.append((corners, n, body))
    for corners, n in _box_faces(cab_r, cab_f, -Wd * 0.85, Wd * 0.85,
                                 bh, bh + ch):
        col = glass if n[0] != 0 else (body * 0.85 if n[2] else glass)
        quads.append((corners, n, col))
    # wheels: four dark boxes under the body
    wr = 0.32
    for wx in (L * 0.62, -L * 0.62):
        for wy in (Wd, -Wd):
            for corners, n in _box_faces(wx - wr, wx + wr,
                                         wy - 0.08, wy + 0.08,
                                         -wr, wr):
                quads.append((corners, n, dark))
    # headlights (front face, bright) and taillights (rear face, red)
    for wy in (Wd * 0.6, -Wd * 0.6):
        for corners, n in _box_faces(L, L + 0.06, wy - 0.18, wy + 0.18,
                                     bh * 0.55, bh * 0.85):
            quads.append((corners, n, lamp))
        for corners, n in _box_faces(-L - 0.06, -L, wy - 0.18, wy + 0.18,
                                     bh * 0.55, bh * 0.85):
            quads.append((corners, n, red))
    return quads


def _render_car_view(quads, azi: float, ele: float) -> np.ndarray:
    """Orthographic painter's-algorithm raster of the quad car.

    Camera sits at azimuth ``azi`` / elevation ``ele`` looking at the
    origin; azi=0 faces the FRONT of the car (matches the reference's
    Blender sprite convention, render_car.py:350-357).
    """
    cam = np.asarray([math.cos(azi) * math.cos(ele),
                      math.sin(azi) * math.cos(ele),
                      math.sin(ele)])
    fwd = -cam
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    light = np.asarray([0.5, 0.3, 0.8])
    light /= np.linalg.norm(light)

    im = np.zeros((ASSET_H, ASSET_W, 4), np.float32)
    scale = ASSET_W / 5.6            # ~max car extent fills the tile
    cx, cy = ASSET_W / 2.0, ASSET_H / 2.0 + 0.12 * ASSET_H
    yy, xx = np.mgrid[0:ASSET_H, 0:ASSET_W]

    vis = []
    for corners, n, col in quads:
        n = np.asarray(n, np.float64)
        if np.dot(n, cam) <= 0.02:
            continue                  # backface
        P = np.stack(corners)          # (4, 3)
        u = P @ right * scale + cx
        v = -(P @ up) * scale + cy
        depth = float(np.mean(P @ cam))
        shade = 0.55 + 0.45 * max(0.0, float(np.dot(n, light)))
        vis.append((depth, np.stack([u, v], -1), np.asarray(col) * shade))
    vis.sort(key=lambda t: t[0])      # far -> near

    for _, uv, col in vis:
        # convex quad fill: same-side test against all 4 edges
        area = 0.0
        for i in range(4):
            j = (i + 1) % 4
            area += uv[i, 0] * uv[j, 1] - uv[j, 0] * uv[i, 1]
        sgn = 1.0 if area > 0 else -1.0
        inside = np.ones((ASSET_H, ASSET_W), bool)
        for i in range(4):
            j = (i + 1) % 4
            ex, ey = uv[j, 0] - uv[i, 0], uv[j, 1] - uv[i, 1]
            cross = ex * (yy - uv[i, 1]) - ey * (xx - uv[i, 0])
            inside &= (sgn * cross) >= 0
        im[inside, :3] = col
        im[inside, 3] = 1.0
    return im


def procedural_car_assets(num_azi: int = 24, num_ele: int = 2,
                          variants: int = 4, seed: int = 0
                          ) -> CarAssetPool:
    """Fabricate 3D-projected car sprites across the viewing sphere.

    Stand-in for the reference's transparent Blender renders
    (render_car.py:188-223): each sprite is a painter's-algorithm
    orthographic projection of a randomized box-model car with distinct
    front/rear/side appearance, so azimuth is visually decidable from a
    single sprite. ``variants`` models are rendered per view; each
    variant's azimuth grid is offset by a fraction of the bin width so
    the pool covers the circle densely rather than only at bin centres.
    """
    rng = np.random.default_rng(seed)
    rgba, view = [], []
    eles = [7.5] if num_ele == 1 else [5.0 + 12.0 * i for i in range(num_ele)]
    for v in range(variants):
        quads = _car_quads(rng)
        off = (v / max(variants, 1)) * (360.0 / num_azi)
        for ele_deg in eles:
            for k in range(num_azi):
                azi = math.radians(360.0 * k / num_azi + off)
                ele = math.radians(ele_deg)
                rgba.append(_render_car_view(quads, azi, ele))
                view.append([ele, azi])
    return CarAssetPool.from_arrays(np.stack(rgba),
                                    np.asarray(view, np.float32))


def great_circle_label_dist(ele, azi, class_ele, class_azi,
                            sigma: float = 0.1):
    """Soft label over viewpoint bins via great-circle distance Gaussian
    (render_car.py:410-438). Inputs rad; class_* are (C,) arrays."""
    cos_ang = jnp.arccos(jnp.clip(
        jnp.sin(ele) * jnp.sin(class_ele) +
        jnp.cos(ele) * jnp.cos(class_ele) * jnp.cos(azi - class_azi),
        -1.0, 1.0))
    g = jnp.exp(-cos_ang ** 2 / sigma)
    dist = g / jnp.sum(g)
    return jnp.argmin(cos_ang), dist


class CarRenderer:
    """Batched scene composer. ``classes`` is the spec's (azi°, ele°) list."""

    def __init__(self, img_h: int, img_w: int, classes,
                 pool: Optional[CarAssetPool] = None,
                 pascal_pool: Optional[CarAssetPool] = None,
                 min_scale: float = 0.2, max_scale: float = 1.0):
        self.h, self.w = int(img_h), int(img_w)
        cls = np.asarray(classes, np.float32)
        self.class_azi = jnp.asarray(np.radians(cls[:, 0]))
        self.class_ele = jnp.asarray(np.radians(cls[:, 1]))
        self.num_cls = len(cls)
        self.pool = pool or procedural_car_assets()
        self.pascal_pool = pascal_pool
        self.min_scale = min_scale
        self.max_scale = max_scale

    def _compose_one(self, key, pool: CarAssetPool):
        """Pick, scale, rotate and place one sprite; return rgb/alpha layers
        and the label row [cls, y, x, h, w, r, dist...]."""
        ks = jax.random.split(key, 6)
        n = pool.rgba.shape[0]
        idx = jax.random.randint(ks[0], (), 0, n)
        sprite = pool.rgba[idx]
        ele, azi = pool.view[idx, 0], pool.view[idx, 1]
        bb = pool.bbox[idx]

        scale = jax.random.uniform(ks[1], (), minval=self.min_scale,
                                   maxval=self.max_scale)
        r1 = jax.random.uniform(ks[2], (), minval=0.9, maxval=1.1)
        rot = jax.random.uniform(ks[3], (),
                                 minval=-30.0, maxval=30.0) * math.pi / 180.0
        # content box corners in sprite px
        corners = jnp.stack([
            jnp.stack([bb[0], bb[1]]), jnp.stack([bb[2], bb[1]]),
            jnp.stack([bb[0], bb[3]]), jnp.stack([bb[2], bb[3]])])
        c, s = jnp.cos(rot), jnp.sin(rot)
        M = jnp.asarray([[c, -s], [s, c]]) @ \
            jnp.asarray([[scale, 0.0], [0.0, scale * r1]])
        ctr_sprite = jnp.asarray([ASSET_W / 2.0, ASSET_H / 2.0])
        # random box centre such that ~the whole car stays visible-ish
        rc = M @ (corners - ctr_sprite).T                  # (2, 4)
        half_w = (jnp.max(rc[0]) - jnp.min(rc[0])) / 2
        half_h = (jnp.max(rc[1]) - jnp.min(rc[1])) / 2
        cx = jax.random.uniform(ks[4], (), minval=0.2, maxval=0.8) * self.w
        cy = jax.random.uniform(ks[5], (), minval=0.2, maxval=0.8) * self.h
        box_ctr_off = (jnp.max(rc, 1) + jnp.min(rc, 1)) / 2

        t = jnp.stack([cx, cy]) - box_ctr_off
        Minv = jnp.linalg.inv(M)
        A = jnp.concatenate(
            [Minv, (ctr_sprite[:, None] - Minv @ t[:, None])], -1)
        warped = warp_affine(sprite, A, (self.h, self.w))

        cls_idx, dist = great_circle_label_dist(
            ele, azi, self.class_ele, self.class_azi)
        label = jnp.concatenate([
            jnp.stack([cls_idx.astype(jnp.float32),
                       cy / self.h, cx / self.w,
                       (2 * half_h) / self.h, (2 * half_w) / self.w,
                       rot]),
            dist])
        return warped[..., :3], warped[..., 3:], label

    def _compose_layer(self, key, k_pick, B, pascal_rate):
        """One object layer for the whole batch: (rgb, alpha, label)."""
        item_keys = jax.random.split(key, B)
        rgb, alpha, label = jax.vmap(
            lambda k: self._compose_one(k, self.pool))(item_keys)
        if self.pascal_pool is not None and pascal_rate > 0:
            rgb2, alpha2, label2 = jax.vmap(
                lambda k: self._compose_one(k, self.pascal_pool))(item_keys)
            pick2 = (jax.random.uniform(k_pick, (B,)) < pascal_rate)
            sel = lambda a, b: jnp.where(  # noqa: E731
                pick2.reshape((B,) + (1,) * (a.ndim - 1)), b, a)
            rgb, alpha, label = sel(rgb, rgb2), sel(alpha, alpha2), \
                sel(label, label2)
        return rgb, alpha, label

    def render(self, key, bg_batch, render_rate: float = 1.0,
               pascal_rate: float = 0.0, num_obj: int = 1):
        """(B, h, w, 3) backgrounds -> (images, labels (B, num_obj, 6+C)).

        Each of ``num_obj`` slots is filled independently with
        probability ``render_rate``; empty slots carry a -1 label row
        (reference render_car.py:52-138 composes one car per image; its
        offline Tools/gen_dataset.py pastes five — this renderer does
        both). Layers composite in slot order, so a later slot occludes
        an earlier one where they overlap; the target assigner's
        winner-takes-slot rule (targets/car.py) matches that order.
        ``pascal_rate`` picks the second asset pool when present.
        """
        B = bg_batch.shape[0]
        k_use, k_obj, k_jit = jax.random.split(key, 3)
        use = jax.random.uniform(k_use, (B, num_obj)) < render_rate

        img = bg_batch
        labels = []
        for o in range(num_obj):
            k_item, k_pick = jax.random.split(jax.random.fold_in(k_obj, o))
            rgb, alpha, label = self._compose_layer(
                k_item, k_pick, B, pascal_rate)
            rgb = random_color_jitter(
                jax.random.fold_in(k_jit, o), rgb, brightness=0.3,
                contrast=0.5, saturation=0.5, hue=0.3)
            a = alpha * use[:, o, None, None, None]
            img = img * (1 - a) + rgb * a
            labels.append(jnp.where(use[:, o, None], label,
                                    -jnp.ones_like(label)))
        return jnp.clip(img, 0.0, 1.0), jnp.stack(labels, axis=1)
