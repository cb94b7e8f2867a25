"""On-device image ops: photometric augmentation, letterbox, flips/clips.

Replaces the reference's host-side PIL/OpenCV/mxnet.image augmentation
stack (yolo_modules/yolo_cv.py:97-157 PILImageEnhance, the
mxnet.image.CreateAugmenter chains at licence_plate_render/__init__.py:50-58
and render_car.py:42-44, cv2_flip_and_clip_frame at yolo_cv.py:285-318)
with batched, RNG-keyed jax that runs inside the jitted render/train step.

Images are NHWC float32/bfloat16 in [0, 1].
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# plain tuple, not a device array: a module-level jnp.asarray would
# initialise the XLA backend at import time, which breaks
# jax.distributed.initialize() (must run before any backend use)
_RGB2GRAY = (0.299, 0.587, 0.114)


def adjust_brightness(img, factor):
    return img * factor


def adjust_contrast(img, factor):
    w = jnp.asarray(_RGB2GRAY, img.dtype)
    mean = jnp.mean(img * w, axis=(-3, -2, -1), keepdims=True) * 3.0
    return (img - mean) * factor + mean


def adjust_saturation(img, factor):
    gray = jnp.sum(img * jnp.asarray(_RGB2GRAY, img.dtype), axis=-1,
                   keepdims=True)
    return (img - gray) * factor + gray


def adjust_hue(img, delta):
    """Hue rotation via the YIQ approximation; ``delta`` (radians) may be a
    scalar or any shape broadcastable against img[..., :1]."""
    T = jnp.asarray([[0.299, 0.587, 0.114],
                     [0.596, -0.274, -0.321],
                     [0.211, -0.523, 0.311]])
    Tinv = jnp.asarray([[1.0, 0.956, 0.621],
                        [1.0, -0.272, -0.647],
                        [1.0, -1.107, 1.705]])
    yiq = jnp.einsum("...c,dc->...d", img, T)
    c = jnp.cos(delta)
    s = jnp.sin(delta)
    y = yiq[..., 0:1]
    i = yiq[..., 1:2] * c - yiq[..., 2:3] * s
    q = yiq[..., 1:2] * s + yiq[..., 2:3] * c
    return jnp.einsum("...c,dc->...d", jnp.concatenate([y, i, q], -1), Tinv)


def random_color_jitter(key, img, brightness=0.0, contrast=0.0,
                        saturation=0.0, hue=0.0, noise_std=0.0):
    """Batched color jitter. ``img``: (B, H, W, 3). Each sample draws its
    own factors — semantics of mxnet.image.CreateAugmenter(brightness=...,
    contrast=..., saturation=..., hue=...) as used by the reference
    renderers."""
    B = img.shape[0]
    ks = jax.random.split(key, 5)

    def u(k, lo, hi):
        return jax.random.uniform(k, (B, 1, 1, 1), minval=lo, maxval=hi)

    if brightness:
        img = adjust_brightness(img, u(ks[0], 1 - brightness, 1 + brightness))
    if contrast:
        img = adjust_contrast(img, u(ks[1], 1 - contrast, 1 + contrast))
    if saturation:
        img = adjust_saturation(img, u(ks[2], 1 - saturation, 1 + saturation))
    if hue:
        delta = jax.random.uniform(ks[3], (B, 1, 1, 1),
                                   minval=-hue, maxval=hue) * jnp.pi
        img = adjust_hue(img, delta[..., 0:1])
    if noise_std:
        img = img + noise_std * jax.random.normal(ks[4], img.shape)
    return jnp.clip(img, 0.0, 1.0)


def gaussian_blur(img, sigma, radius: int = 3):
    """Separable gaussian blur with a static kernel radius; ``sigma`` may be
    a traced scalar (sigma ~ 0 degenerates to identity). img: (..., H, W, C).
    Stands in for PIL GaussianBlur in the plate renderer
    (yolo_cv.py:154-157)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sig = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sig) ** 2)
    k = k / jnp.sum(k)

    # convolve along W then H via depthwise conv
    def conv1d(im, kernel, axis):
        kern = kernel.reshape((-1, 1) if axis == -3 else (1, -1))
        kern = kern[:, :, None, None]  # (kh, kw, 1, 1)
        C = im.shape[-1]
        kern = jnp.tile(kern, (1, 1, 1, C))
        lhs = im[None] if im.ndim == 3 else im
        out = jax.lax.conv_general_dilated(
            lhs, kern,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)
        return out[0] if im.ndim == 3 else out
    img = conv1d(img, k, axis=-2)
    img = conv1d(img, k, axis=-3)
    return img


def letterbox(img, out_hw: Tuple[int, int], fill=0.5):
    """Pad-and-centre an (H, W, C) image onto an (out_h, out_w) canvas
    without resampling when it already fits; returns (canvas, scale, (dy, dx)).

    Static-shape helper for serving: aligns arbitrary frame sizes to the
    stride-64-aligned network input.
    """
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    canvas = jnp.full((oh, ow, img.shape[2]), fill, img.dtype)
    dy = (oh - H) // 2
    dx = (ow - W) // 2
    canvas = jax.lax.dynamic_update_slice(canvas, img, (dy, dx, 0))
    return canvas, 1.0, (dy, dx)


def resize_bilinear(img, out_hw: Tuple[int, int]):
    """jax.image.resize wrapper (NHWC or HWC)."""
    if img.ndim == 4:
        shape = (img.shape[0], out_hw[0], out_hw[1], img.shape[3])
    else:
        shape = (out_hw[0], out_hw[1], img.shape[2])
    return jax.image.resize(img, shape, method="bilinear")


def flip_and_clip(img, clip_hw: Sequence[float] = (1.0, 1.0), flip: int = 3):
    """Centre-clip by height/width ratios then flip.

    flip: 1 = left-right, 0 = top-down, -1 = both, anything else = no-op —
    the cv2_flip_and_clip_frame contract (yolo_cv.py:285-318).
    """
    H, W = img.shape[-3], img.shape[-2]
    if clip_hw[0] < 1:
        top = int((1 - clip_hw[0]) * H / 2.0)
        img = img[..., top:H - top, :, :]
    if clip_hw[1] < 1:
        left = int((1 - clip_hw[1]) * W / 2.0)
        img = img[..., :, left:W - left, :]
    if flip == 1:
        img = img[..., :, ::-1, :]
    elif flip == 0:
        img = img[..., ::-1, :, :]
    elif flip == -1:
        img = img[..., ::-1, ::-1, :]
    return img


def white_balance(img, rgb_gains=None):
    """Grey-world white balance (yolo_cv.py:214-231)."""
    if rgb_gains is None:
        avg = jnp.mean(img, axis=(-3, -2), keepdims=True)
        rgb_gains = jnp.sum(avg, -1, keepdims=True) / (avg * 3.0 + 1e-8)
    return jnp.clip(img * rgb_gains, 0.0, 1.0)


# ---------------------------------------------------------------------------
# NV12 (YUV420 semi-planar) ingestion — the native wire format of real
# camera stacks (V4L2, GStreamer nvvidconv, the reference's Jetson
# onboard-camera pipelines at yolo_modules/yolo_cv.py:321-345 emit I420/
# NV12 before their host-side conversion to BGR). Streaming NV12 instead
# of RGB u8 halves host->device bytes (1.5 vs 3 per pixel) — on a
# bandwidth-bound serving transport that is a 2x frame-rate lever
# (reports/transport_sol.json) — and moves the colour conversion onto
# the TPU where it fuses with letterbox + normalize.
# Full-range BT.601 (JFIF) coefficients; rgb_to_nv12 is the exact host-
# side encoder twin (numpy, for producers/tests).

def nv12_to_rgb(frames, frame_hw: Tuple[int, int]):
    """Decode packed NV12 frames to RGB float32 in [0, 1], on device.

    ``frames``: (B, fh*3//2, fw) uint8 — fh rows of Y, then fh//2 rows of
    interleaved U,V at half resolution (semi-planar 4:2:0). ``frame_hw``
    must be even. Chroma upsampling is nearest (2x2 repeat), matching
    rgb_to_nv12's 2x2-mean subsampling closely enough for detection
    inputs while staying a pure reshape/broadcast (no gathers).
    """
    fh, fw = frame_hw
    assert fh % 2 == 0 and fw % 2 == 0, (fh, fw)
    B = frames.shape[0]
    y = frames[:, :fh, :].astype(jnp.float32)
    uv = frames[:, fh:, :].reshape(B, fh // 2, fw // 2, 2).astype(
        jnp.float32) - 128.0
    # nearest 2x upsample via broadcast-reshape (layout-friendly: no gather)
    uv = jnp.broadcast_to(uv[:, :, None, :, None, :],
                          (B, fh // 2, 2, fw // 2, 2, 2))
    uv = uv.reshape(B, fh, fw, 2)
    u, v = uv[..., 0], uv[..., 1]
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)


def rgb_to_nv12(rgb_u8):
    """Host-side (numpy) encoder twin of :func:`nv12_to_rgb`.

    ``rgb_u8``: (B, fh, fw, 3) or (fh, fw, 3) uint8, even fh/fw. Returns
    packed NV12 uint8 of shape (B, fh*3//2, fw) (batch dim preserved).
    """
    import numpy as np

    single = rgb_u8.ndim == 3
    if single:
        rgb_u8 = rgb_u8[None]
    B, fh, fw, _ = rgb_u8.shape
    assert fh % 2 == 0 and fw % 2 == 0, (fh, fw)
    rgb = rgb_u8.astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # 4:2:0 chroma: 2x2 mean
    u = u.reshape(B, fh // 2, 2, fw // 2, 2).mean(axis=(2, 4))
    v = v.reshape(B, fh // 2, 2, fw // 2, 2).mean(axis=(2, 4))
    uv = np.stack([u, v], axis=-1).reshape(B, fh // 2, fw)
    out = np.concatenate(
        [y, uv], axis=1)                     # (B, fh*3//2, fw)
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[0] if single else out
