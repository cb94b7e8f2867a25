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
        if not rgba:
            return None
        return CarAssetPool.from_arrays(np.stack(rgba),
                                        np.asarray(view, np.float32))


def procedural_car_assets(num_azi: int = 24, num_ele: int = 2,
                          seed: int = 0) -> CarAssetPool:
    """Fabricate car-like silhouettes across the viewing sphere.

    Geometry responds to azimuth/elevation (side view wide, front/back
    narrow; higher elevation squashes) so nets can actually learn the
    orientation signal end-to-end in tests.
    """
    rng = np.random.default_rng(seed)
    rgba, view = [], []
    eles = [7.5] if num_ele == 1 else [7.5 + 15.0 * i for i in range(num_ele)]
    for ele_deg in eles:
        for k in range(num_azi):
            azi_deg = 360.0 * k / num_azi
            azi = math.radians(azi_deg)
            ele = math.radians(ele_deg)
            im = np.zeros((ASSET_H, ASSET_W, 4), np.float32)
            # car length foreshortens with cos(azi); height with ele
            length = 0.35 + 0.45 * abs(math.cos(azi))
            height = (0.30 - 0.08 * math.sin(ele)) * (1 + 0.2 * abs(math.sin(azi)))
            L = int(length * ASSET_W)
            Hh = int(height * ASSET_H)
            cx, cy = ASSET_W // 2, ASSET_H // 2 + Hh // 4
            color = rng.uniform(0.2, 0.9, size=3)
            x0, x1 = cx - L // 2, cx + L // 2
            y0, y1 = cy - Hh // 2, cy + Hh // 2
            im[y0:y1, x0:x1, :3] = color
            im[y0:y1, x0:x1, 3] = 1.0
            # cabin block shifted toward the rear (encodes azimuth sign)
            shift = int(0.15 * L * math.sin(azi))
            cab_w = max(L // 3, 8)
            cx0 = np.clip(cx - cab_w // 2 + shift, 0, ASSET_W - cab_w)
            cab_h = max(Hh // 2, 6)
            im[y0 - cab_h:y0, cx0:cx0 + cab_w, :3] = color * 0.6
            im[y0 - cab_h:y0, cx0:cx0 + cab_w, 3] = 1.0
            # wheels (only visible from the side)
            wheel_r = max(Hh // 4, 3)
            if abs(math.cos(azi)) > 0.3:
                for wx in (x0 + L // 5, x1 - L // 5):
                    im[y1 - wheel_r:y1 + wheel_r,
                       wx - wheel_r:wx + wheel_r, :3] = 0.05
                    im[y1 - wheel_r:y1 + wheel_r,
                       wx - wheel_r:wx + wheel_r, 3] = 1.0
            rgba.append(im)
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

    def render(self, key, bg_batch, render_rate: float = 1.0,
               pascal_rate: float = 0.0):
        """(B, h, w, 3) backgrounds -> (images, labels (B, 1, 6+num_cls)).

        With probability 1-render_rate an image stays empty and its label
        row is -1 (reference render_car.py:52-138). ``pascal_rate`` picks
        the second asset pool when present.
        """
        B = bg_batch.shape[0]
        k_use, k_pick, k_items, k_jit = jax.random.split(key, 4)
        use = jax.random.uniform(k_use, (B,)) < render_rate
        item_keys = jax.random.split(k_items, B)

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

        rgb = random_color_jitter(k_jit, rgb, brightness=0.3, contrast=0.5,
                                  saturation=0.5, hue=0.3)
        alpha = alpha * use[:, None, None, None]
        img = jnp.clip(bg_batch * (1 - alpha) + rgb * alpha, 0.0, 1.0)
        label = jnp.where(use[:, None], label, -jnp.ones_like(label))
        return img, label[:, None, :]
