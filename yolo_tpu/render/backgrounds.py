"""Background image supply for the synthetic renderers.

The reference streams SUN2012 RecordIO shards with mxnet.image.ImageIter
plus color jitter (yolo_modules/yolo_gluon.py:43-77). Here:

* ``BackgroundPool`` — host-decodes a directory of images once into a
  fixed-size device-resident pool; per-step sampling (random pick, flip,
  crop jitter, color jitter) is a jitted gather, so the training loop
  never touches the host.
* ``procedural_backgrounds`` — a pure-jax fallback (gradients + filtered
  noise + random rectangles) when no dataset directory is available, so
  every pipeline runs out of the box.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.ops.image import random_color_jitter


def procedural_backgrounds(key, batch: int, h: int, w: int):
    """(B, h, w, 3) synthetic scenes in [0, 1]."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    # smooth color gradient per image
    c0 = jax.random.uniform(k1, (batch, 1, 1, 3))
    c1 = jax.random.uniform(k2, (batch, 1, 1, 3))
    ramp_dir = jax.random.uniform(k3, (batch, 1, 1, 1))
    yy = jnp.linspace(0, 1, h)[None, :, None, None]
    xx = jnp.linspace(0, 1, w)[None, None, :, None]
    ramp = ramp_dir * yy + (1 - ramp_dir) * xx
    img = c0 * (1 - ramp) + c1 * ramp

    # low-frequency noise (blurred by average pooling of random fields)
    noise = jax.random.uniform(k4, (batch, h // 8, w // 8, 3))
    noise = jax.image.resize(noise, (batch, h, w, 3), "bilinear")
    img = 0.7 * img + 0.3 * noise

    # a few random dark/light rectangles for structure
    def add_rects(im, k):
        ks = jax.random.split(k, 4)
        ry = jax.random.randint(ks[0], (2,), 0, max(h - 20, 1))
        rx = jax.random.randint(ks[1], (2,), 0, max(w - 20, 1))
        rh = jax.random.randint(ks[2], (2,), 10, max(h // 2, 11))
        shade = jax.random.uniform(ks[3], (2, 1))
        yy2 = jnp.arange(h)[:, None]
        xx2 = jnp.arange(w)[None, :]
        for i in range(2):
            m = ((yy2 >= ry[i]) & (yy2 < ry[i] + rh[i]) &
                 (xx2 >= rx[i]) & (xx2 < rx[i] + rh[i] * 2))[..., None]
            im = jnp.where(m, 0.5 * im + 0.5 * shade[i], im)
        return im

    img = jax.vmap(add_rects)(img, jax.random.split(k5, batch))
    return jnp.clip(img, 0.0, 1.0)


class BackgroundPool:
    """Device-resident pool of real background images.

    ``root`` may contain jpg/png files (e.g. SUN2012 extracted); they are
    decoded and letterbox-resized once on host. If the directory is
    missing/empty, sampling falls back to procedural backgrounds.
    """

    def __init__(self, root: Optional[str], h: int, w: int,
                 max_images: int = 512):
        self.h, self.w = int(h), int(w)
        self.pool = None
        if root and os.path.isfile(root) and root.endswith(".npy"):
            # packed shard from tools.datasets.pack_image_pool
            arr = np.load(root)[:max_images].astype(np.float32) / 255.0
            if arr.shape[1:3] != (self.h, self.w):
                import jax
                arr = np.asarray(jax.image.resize(
                    jnp.asarray(arr),
                    (arr.shape[0], self.h, self.w, 3), "bilinear"))
            self.pool = jnp.asarray(arr)
        elif root and os.path.isdir(root):
            try:
                from PIL import Image
                files = sorted(
                    f for f in os.listdir(root)
                    if f.lower().endswith((".jpg", ".jpeg", ".png")))
                imgs = []
                for f in files[:max_images]:
                    im = Image.open(os.path.join(root, f)).convert("RGB")
                    im = im.resize((self.w, self.h), Image.BILINEAR)
                    imgs.append(np.asarray(im, np.float32) / 255.0)
                if imgs:
                    self.pool = jnp.asarray(np.stack(imgs))
            except Exception:
                self.pool = None

    def sample(self, key, batch: int):
        if self.pool is None:
            return procedural_backgrounds(key, batch, self.h, self.w)
        k1, k2, k3 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (batch,), 0, self.pool.shape[0])
        imgs = self.pool[idx]
        flip = jax.random.bernoulli(k2, 0.5, (batch,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        return random_color_jitter(k3, imgs, brightness=0.5, contrast=0.5,
                                   saturation=0.5, hue=0.2)
