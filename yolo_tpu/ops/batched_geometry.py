"""Natively batched geometry for the hot inference path.

``jax.vmap`` over the scalar-matmul formulation in ``ops.geometry`` is
fine for training-time use, but fusing that per-image scalar soup into the
warp gather sends the TPU compiler into a pathological state (compilation
of projector+warp at batch 64 did not terminate). These twins compute the
same math with plain elementwise ops shaped (B, ...) throughout — no vmap,
no 3x3 matmuls — and one flat batched gather, which XLA compiles and runs
at full speed.

Used by the fused serving pipelines; numerically identical to the
reference path (tested against ops.geometry).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_tpu.ops.geometry import CameraIntrinsics


def project_corners_batched(poses, camera: CameraIntrinsics,
                            img_hw: Sequence[int],
                            half_w: float = 199.5, half_h: float = 84.0):
    """(B, 6) poses [X, Y, Z, r1, r2, r3] -> (B, 4, 2) pixel corners in an
    (H, W) image. Same algebra as PlateProjector.corners_in_image, written
    elementwise. Corner order [rb, lb, lt, rt]."""
    X, Y, Z = poses[:, 0], poses[:, 1], poses[:, 2]
    r1, r2, r3 = poses[:, 3], poses[:, 4], poses[:, 5]
    s1, c1 = jnp.sin(r1), jnp.cos(r1)
    s2, c2 = jnp.sin(r2), jnp.cos(r2)
    s3, c3 = jnp.sin(r3), jnp.cos(r3)

    # R3 @ R2 @ R1 rows (closed form)
    m00 = c3 * c2
    m01 = c3 * s2 * s1 - s3 * c1
    m10 = s3 * c2
    m11 = s3 * s2 * s1 + c3 * c1
    m20 = -s2
    m21 = c2 * s1
    # corners in plate frame: (±half_w, ±half_h, 0), order rb, lb, lt, rt
    cw = jnp.asarray([half_w, -half_w, -half_w, half_w])
    ch = jnp.asarray([half_h, half_h, -half_h, -half_h])
    # camera-frame points (B, 4)
    px = m00[:, None] * cw + m01[:, None] * ch + X[:, None]
    py = m10[:, None] * cw + m11[:, None] * ch + Y[:, None]
    pz = m20[:, None] * cw + m21[:, None] * ch + Z[:, None]
    u = (camera.fx * px / pz + camera.cx) * (img_hw[1] / float(camera.width))
    v = (camera.fy * py / pz + camera.cy) * (img_hw[0] / float(camera.height))
    return jnp.stack([u, v], -1)


def _unit_to_quad_batched(quad):
    """(B, 4, 2) quads -> 9 components (each (B,)) of the unit-square ->
    quad homography (Heckbert closed form, batched)."""
    x0, x1, x2, x3 = quad[:, 0, 0], quad[:, 1, 0], quad[:, 2, 0], quad[:, 3, 0]
    y0, y1, y2, y3 = quad[:, 0, 1], quad[:, 1, 1], quad[:, 2, 1], quad[:, 3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1, dx2 = x1 - x2, x3 - x2
    dy1, dy2 = y1 - y2, y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    safe = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    g = (sx * dy2 - dx2 * sy) / safe
    h = (dx1 * sy - sx * dy1) / safe
    affine = (jnp.abs(sx) < 1e-9) & (jnp.abs(sy) < 1e-9)
    g = jnp.where(affine, 0.0, g)
    h = jnp.where(affine, 0.0, h)
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    one = jnp.ones_like(a)
    return a, b, x0, d, e, y0, g, h, one


def unwarp_plates_matmul(images, corners, out_hw: Tuple[int, int],
                         window_hw: Tuple[int, int] = (128, 256),
                         fill: float = 0.0):
    """Gather-free plate rectification: two-pass separable resampling as
    dense one-hot matmuls (Catmull-Smith decomposition of the homography).

    Random-access gathers run at ~7-15 ns/element on TPU; this restates
    the same warp as (1) a dynamic-slice window crop around the plate,
    (2) a horizontal 1-D resample of every window row at the positions
    where that row intersects each output column (an interpolation-matrix
    matmul on the MXU), then (3) a vertical 1-D resample per column.
    Output matches direct bilinear sampling to sub-pixel accuracy (the
    two linear passes use the row-intersection abscissa, which differs
    from the direct sample point by < |dx/dy| of one row).

    images: (B, H, W, C); corners (B, 4, 2) [rb, lb, lt, rt].
    """
    B, H, W, C = images.shape
    oh, ow = out_hw
    # window cannot exceed the image (dynamic_slice sizes are static)
    wh, ww = min(window_hw[0], H), min(window_hw[1], W)
    dtype = images.dtype

    # ---- window crop around the quad bbox ----
    cx = jnp.mean(corners[:, :, 0], axis=1)
    cy = jnp.mean(corners[:, :, 1], axis=1)
    ox = jnp.clip((cx - ww / 2).astype(jnp.int32), 0, max(W - ww, 0))
    oy = jnp.clip((cy - wh / 2).astype(jnp.int32), 0, max(H - wh, 0))
    windows = jax.vmap(
        lambda img, y0, x0: jax.lax.dynamic_slice(
            img, (y0, x0, 0), (wh, ww, C)))(images, oy, ox)
    # corners in window coordinates
    off = jnp.stack([ox, oy], -1).astype(jnp.float32)[:, None, :]
    cwin = corners - off

    # ---- homography components (output px -> window px) ----
    quad = jnp.stack(
        [cwin[:, 2], cwin[:, 3], cwin[:, 0], cwin[:, 1]], axis=1)
    a, b, c, d, e, f, g, h, one = _unit_to_quad_batched(quad)

    def bc(t, nd=3):
        return t.reshape(t.shape + (1,) * (nd - 1))

    # ---- pass 1: horizontal resample of every window row ----
    # for output column j (normalised un) and window row y, the output row
    # that lands on y has vn = (d*un + f - y*(g*un + 1)) / (y*h - e); the
    # sample abscissa there is x = (a*un + b*vn + c) / (g*un + h*vn + 1).
    un = (jnp.arange(ow, dtype=jnp.float32) / ow)[None, None, :]  # (1,1,ow)
    yy = jnp.arange(wh, dtype=jnp.float32)[None, :, None]          # (1,wh,1)
    den_v = yy * bc(h) - bc(e)
    den_v = jnp.where(jnp.abs(den_v) < 1e-6, 1e-6, den_v)
    vn = (bc(d) * un + bc(f) - yy * (bc(g) * un + bc(one))) / den_v
    den_x = bc(g) * un + bc(h) * vn + bc(one)
    xs = (bc(a) * un + bc(b) * vn + bc(c)) / den_x          # (B, wh, ow)

    cols = jnp.arange(ww, dtype=jnp.float32)
    w1 = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[..., None] - cols)).astype(dtype)
    # (B, wh, ow, ww) @ (B, wh, ww, C) -> (B, wh, ow, C)
    mid = jnp.einsum("byjc,byck->byjk", w1, windows)

    # ---- pass 2: vertical resample per output column ----
    vn2 = (jnp.arange(oh, dtype=jnp.float32) / oh)[None, :, None]  # (1,oh,1)
    un2 = (jnp.arange(ow, dtype=jnp.float32) / ow)[None, None, :]
    den2 = bc(g) * un2 + bc(h) * vn2 + bc(one)
    ys = (bc(d) * un2 + bc(e) * vn2 + bc(f)) / den2          # (B, oh, ow)
    rows = jnp.arange(wh, dtype=jnp.float32)
    w2 = jnp.maximum(
        0.0, 1.0 - jnp.abs(ys[..., None] - rows)).astype(dtype)
    out = jnp.einsum("bijy,byjk->bijk", w2, mid)

    # validity in WINDOW coords: a sample outside the crop window has
    # all-zero interpolation weights (garbage 0s), so it must be filled
    # even when it lies inside the full image — a quad wider than the
    # window (very near plate) or far off-centre gets explicit `fill`
    # instead of silently-black columns flagged valid. The window is
    # always fully inside the image, so in-window implies in-image.
    xs2 = (bc(a) * un2 + bc(b) * vn2 + bc(c)) / den2
    valid = ((xs2 >= -0.5) & (xs2 <= ww - 0.5) &
             (ys >= -0.5) & (ys <= wh - 0.5))[..., None]
    return jnp.where(valid, out, fill).astype(dtype)


def inv3x3_batched(a, b, c, d, e, f, g, h, i):
    """Adjugate inverse of batched 3x3s given as 9 (B,) components.
    Returns 9 components of the (unnormalised) inverse — fine for
    homography use where overall scale cancels."""
    A = e * i - f * h
    B_ = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H_ = b * g - a * h
    I_ = a * e - b * d
    return A, B_, C, D, E, F, G, H_, I_


def plate_to_scene_coords(corners_scene, pts_u, pts_v):
    """Map plate-fraction points through the plate homography to scene px
    (forward counterpart of scene_to_plate_coords).

    corners_scene: (B, 4, 2) plate quad [rb, lb, lt, rt] in scene px.
    pts_u/pts_v: (B, K) fractions — u rightward across the plate width,
    v downward. Returns scene-px (B, K) x, y.
    """
    quad = jnp.stack([corners_scene[:, 2], corners_scene[:, 3],
                      corners_scene[:, 0], corners_scene[:, 1]], axis=1)
    a, b, c, d, e, f, g, h, one = _unit_to_quad_batched(quad)

    def bc(t):
        return t[:, None]

    w = bc(g) * pts_u + bc(h) * pts_v + bc(one)
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    x = (bc(a) * pts_u + bc(b) * pts_v + bc(c)) / w
    y = (bc(d) * pts_u + bc(e) * pts_v + bc(f)) / w
    return x, y


def scene_to_plate_coords(corners_scene, pts_x, pts_y,
                          plate_wh: Tuple[int, int]):
    """Map scene-pixel points through the inverse plate homography.

    corners_scene: (B, 4, 2) plate quad [rb, lb, lt, rt] in scene px.
    pts_x/pts_y: (B, K) scene coords. Returns plate-px (B, K) x, y.
    """
    pw, ph = plate_wh
    quad = jnp.stack([corners_scene[:, 2], corners_scene[:, 3],
                      corners_scene[:, 0], corners_scene[:, 1]], axis=1)
    a, b, c, d, e, f, g, h, one = _unit_to_quad_batched(quad)
    A, B_, C, D, E, F, G, H_, I_ = inv3x3_batched(
        a, b, c, d, e, f, g, h, one)

    def bc(t):
        return t[:, None]

    w = bc(G) * pts_x + bc(H_) * pts_y + bc(I_)
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    u = (bc(A) * pts_x + bc(B_) * pts_y + bc(C)) / w
    v = (bc(D) * pts_x + bc(E) * pts_y + bc(F)) / w
    return u * pw, v * ph


def unwarp_plates_batched(images, corners, out_hw: Tuple[int, int],
                          fill: float = 0.0,
                          sample_hw: Tuple[int, int] = None):
    """Rectify plate crops for the whole batch in one gather.

    images: (B, H, W, C); corners: (B, 4, 2) in [rb, lb, lt, rt] order
    (PlateProjector convention). Returns (B, out_h, out_w, C).

    The output-rect -> quad homography is composed per batch element as
    plain arithmetic; sampling is one flat ``take`` over the batch with
    per-image offsets.

    ``sample_hw``: optionally gather at this lower resolution and densely
    resize up to ``out_hw``. Random-access gathers are the single
    slowest primitive on TPU (~15 ns/sample); a detected plate spans far
    fewer source pixels than the 160x384 OCR strip, so sampling at e.g.
    (80, 192) and bilinear-resizing up is visually lossless and ~4x
    faster; the resize itself is a dense VPU op.
    """
    if sample_hw is not None and tuple(sample_hw) != tuple(out_hw):
        import jax
        low = unwarp_plates_batched(images, corners, sample_hw, fill=fill)
        return jax.image.resize(
            low, (low.shape[0], out_hw[0], out_hw[1], low.shape[3]),
            method="bilinear")
    B, H, W, C = images.shape
    oh, ow = out_hw
    # unit square corners (0,0),(1,0),(1,1),(0,1) <-> quad rows lt, rt, rb, lb
    quad = jnp.stack(
        [corners[:, 2], corners[:, 3], corners[:, 0], corners[:, 1]], axis=1)
    a, b, c, d, e, f, g, h, one = _unit_to_quad_batched(quad)

    # output px -> unit square -> quad px
    yy, xx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    un = (xx / ow)[None]              # (1, oh, ow)
    vn = (yy / oh)[None]

    def bc(t):
        return t[:, None, None]       # (B, 1, 1)

    den = bc(g) * un + bc(h) * vn + bc(one)
    xs = (bc(a) * un + bc(b) * vn + bc(c)) / den
    ys = (bc(d) * un + bc(e) * vn + bc(f)) / den

    # one flat batched bilinear gather
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = (xs - x0)[..., None]
    dy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = images.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None, None]

    def g4(yi, xi):
        idx = base + jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return jnp.take(flat, idx, axis=0)

    v00 = g4(y0i, x0i)
    v01 = g4(y0i, x0i + 1)
    v10 = g4(y0i + 1, x0i)
    v11 = g4(y0i + 1, x0i + 1)
    out = ((v00 * (1 - dx) + v01 * dx) * (1 - dy) +
           (v10 * (1 - dx) + v11 * dx) * dy)
    valid = ((xs >= -0.5) & (xs <= W - 0.5) &
             (ys >= -0.5) & (ys <= H - 0.5))[..., None]
    return jnp.where(valid, out, fill)
