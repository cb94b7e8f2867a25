"""Projective geometry: 6-DoF plate projection, homographies, warps.

Replaces the reference's mix of sympy-derived closed forms, OpenCV
``getPerspectiveTransform``/``warpPerspective`` and PIL ``transform``
(yolo_modules/licence_plate_render/__init__.py:97-132, 273-402) with pure
jax that runs batched on device under jit/vmap. The warp samplers are the
building block for both on-device synthetic data rendering and the fused
detector -> unwarp -> OCR inference cascade.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml


# --------------------------------------------------------------------------
# camera model
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole camera used for plate pose synthesis and corner projection.

    Defaults are the Logitech C310 calibration the reference bakes into the
    whole LPD pipeline (camera_parameter/C310_4.yaml projection_matrix;
    loaded at licence_plate_render/__init__.py:277-286).
    """
    fx: float = 890.037231
    fy: float = 889.150513
    cx: float = 314.129602
    cy: float = 220.037739
    width: int = 640
    height: int = 480

    @staticmethod
    def from_ros_yaml(path: str) -> "CameraIntrinsics":
        """Load from a ROS camera_info yaml (same file contract as the
        reference's camera_parameter/*.yaml)."""
        with open(path) as f:
            spec = yaml.safe_load(f)
        P = spec["projection_matrix"]["data"]
        return CameraIntrinsics(
            fx=float(P[0]), fy=float(P[5]), cx=float(P[2]), cy=float(P[6]),
            width=int(spec["image_width"]), height=int(spec["image_height"]))


# --------------------------------------------------------------------------
# 6-DoF plate projection
# --------------------------------------------------------------------------
class PlateProjector:
    """Projects a licence plate's 4 corners through K @ (R3 R2 R1 P + T).

    The plate is a rectangle of half-extents (half_w, half_h) mm in its own
    frame, corners ordered [+w+h, -w+h, -w-h, +w-h] (right-bottom,
    left-bottom, left-top, right-top in image space — the order the
    reference's unwarp relies on, licence_plate_render/__init__.py:388-395).

    NOTE: the reference's hand-expanded projection
    (licence_plate_render/__init__.py:352-377) hard-codes half-extents
    199.5 x 84.0 mm even though the generator is constructed with a
    380 x 160 plate; we default to the same effective values so poses
    decode to identical pixel corners.
    """

    def __init__(self, half_w: float = 199.5, half_h: float = 84.0,
                 camera: CameraIntrinsics = CameraIntrinsics()):
        self.camera = camera
        self.half_w = float(half_w)
        self.half_h = float(half_h)
        # plate-frame corner matrix P_3d (3, 4)
        w, h = self.half_w, self.half_h
        self._P = jnp.asarray(
            [[w, -w, -w, w],
             [h, h, -h, -h],
             [0.0, 0.0, 0.0, 0.0]], jnp.float32)
        self._K = jnp.asarray(
            [[camera.fx, 0.0, camera.cx],
             [0.0, camera.fy, camera.cy],
             [0.0, 0.0, 1.0]], jnp.float32)

    def corners_homogeneous(self, pose6d) -> jnp.ndarray:
        """(3, 4) homogeneous image coords of the 4 corners.

        ``pose6d`` = [X, Y, Z (mm), r1, r2, r3 (rad)].
        """
        X, Y, Z, r1, r2, r3 = (pose6d[0], pose6d[1], pose6d[2],
                               pose6d[3], pose6d[4], pose6d[5])
        c1, s1 = jnp.cos(r1), jnp.sin(r1)
        c2, s2 = jnp.cos(r2), jnp.sin(r2)
        c3, s3 = jnp.cos(r3), jnp.sin(r3)
        R1 = jnp.array([[1, 0, 0], [0, c1, -s1], [0, s1, c1]])
        R2 = jnp.array([[c2, 0, s2], [0, 1, 0], [-s2, 0, c2]])
        R3 = jnp.array([[c3, -s3, 0], [s3, c3, 0], [0, 0, 1]])
        T = jnp.stack([X, Y, Z]).reshape(3, 1)
        # pixel-exact geometry: force full fp32 even on MXU (TPU matmul
        # defaults to bf16, which costs whole pixels at these magnitudes)
        mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731
        ext = mm(mm(mm(R3, R2), R1), self._P) + T
        return mm(self._K, ext)

    def __call__(self, pose6d) -> jnp.ndarray:
        """(4, 2) pixel corners in the calibration camera's frame."""
        ans = self.corners_homogeneous(jnp.asarray(pose6d, jnp.float32))
        return (ans[:2] / ans[2:3]).T

    def corners_in_image(self, pose6d, img_hw: Sequence[int]) -> jnp.ndarray:
        """(4, 2) corners scaled from camera resolution to an image of
        (H, W) px (reference add_edges scaling, __init__.py:382-386)."""
        pts = self(pose6d)
        sx = img_hw[1] / float(self.camera.width)
        sy = img_hw[0] / float(self.camera.height)
        return pts * jnp.asarray([sx, sy], jnp.float32)

    def project_center(self, pose6d, out_hw: Sequence[int]) -> jnp.ndarray:
        """(2,) the plate centre (x, y) px in an (H, W) image — the LPD
        target cell locator (reference __init__.py:124-130)."""
        X, Y, Z = pose6d[0], pose6d[1], pose6d[2]
        cam = self.camera
        x = (X * cam.fx / Z + cam.cx) * out_hw[1] / float(cam.width)
        y = (Y * cam.fy / Z + cam.cy) * out_hw[0] / float(cam.height)
        return jnp.stack([x, y])


# --------------------------------------------------------------------------
# homographies
# --------------------------------------------------------------------------
def homography_unit_to_quad(quad) -> jnp.ndarray:
    """Closed-form 3x3 homography mapping the unit square corners
    (0,0), (1,0), (1,1), (0,1) to ``quad`` rows 0..3 (Heckbert's
    projective-mapping construction).

    Closed form on purpose: an 8x8 ``linalg.solve`` per image lowers to a
    serialised LU on TPU and dominated the whole inference pipeline
    (~300 ms/batch); this is a handful of VPU ops.
    """
    q = jnp.asarray(quad, jnp.float32)
    x0, x1, x2, x3 = q[0, 0], q[1, 0], q[2, 0], q[3, 0]
    y0, y1, y2, y3 = q[0, 1], q[1, 1], q[2, 1], q[3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1, dx2 = x1 - x2, x3 - x2
    dy1, dy2 = y1 - y2, y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    safe_den = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    g = (sx * dy2 - dx2 * sy) / safe_den
    h = (dx1 * sy - sx * dy1) / safe_den
    affine = (jnp.abs(sx) < 1e-9) & (jnp.abs(sy) < 1e-9)
    g = jnp.where(affine, 0.0, g)
    h = jnp.where(affine, 0.0, h)
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    return jnp.stack([jnp.stack([a, b, c]),
                      jnp.stack([d, e, f]),
                      jnp.stack([g, h, jnp.ones_like(a)])])


def inv3x3(H) -> jnp.ndarray:
    """Adjugate inverse (homographies are scale-free, so no det division
    is needed for projective use, but we keep it for numeric sanity)."""
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, h, i = H[2, 0], H[2, 1], H[2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hh = b * g - a * h
    I = a * e - b * d
    adj = jnp.stack([jnp.stack([A, B, C]),
                     jnp.stack([D, E, F]),
                     jnp.stack([G, Hh, I])])
    det = a * A + b * D + c * G
    return adj / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)


def homography_from_4pts(src, dst) -> jnp.ndarray:
    """3x3 homography H with H @ [src, 1] ~ [dst, 1] (the role of
    cv2.getPerspectiveTransform). ``src``/``dst``: (4, 2) with matching
    corner order. Built as unit->dst composed with inv(unit->src) — pure
    closed form, fast under vmap on TPU."""
    return jnp.matmul(homography_unit_to_quad(dst),
                      inv3x3(homography_unit_to_quad(src)),
                      precision="highest")


def apply_homography(H, pts):
    """(N, 2) points through a 3x3 homography."""
    p = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], -1)
    q = jnp.matmul(p, H.T, precision="highest")
    return q[:, :2] / q[:, 2:3]


# --------------------------------------------------------------------------
# warping / sampling
# --------------------------------------------------------------------------
def bilinear_sample(img, xs, ys, fill=0.0):
    """Sample an (H, W, C) image at float pixel coords; out-of-range -> fill.

    xs/ys may be any broadcastable shape; returns xs.shape + (C,).
    Pure gather math — compiles to efficient XLA gathers on TPU.
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = (xs - x0)[..., None]
    dy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return img[yc, xc]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    out = top * (1 - dy) + bot * dy

    valid = ((xs >= -0.5) & (xs <= W - 0.5) &
             (ys >= -0.5) & (ys <= H - 0.5))[..., None]
    return jnp.where(valid, out, fill)


def warp_perspective(img, H_out_to_src, out_hw: Tuple[int, int], fill=0.0):
    """Warp (H, W, C) -> (out_h, out_w, C); H maps OUTPUT px -> SOURCE px.

    Equivalent to cv2.warpPerspective(img, inv(H), ...) / PIL's PERSPECTIVE
    transform convention (coeffs map output coords to input coords,
    reference __init__.py:112-116).
    """
    oh, ow = out_hw
    yy, xx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)
    src = apply_homography(H_out_to_src, pts)
    out = bilinear_sample(img, src[:, 0].reshape(oh, ow),
                          src[:, 1].reshape(oh, ow), fill=fill)
    return out


def warp_affine(img, A_out_to_src, out_hw: Tuple[int, int], fill=0.0):
    """Affine variant; ``A_out_to_src`` is (2, 3) mapping output->source px."""
    oh, ow = out_hw
    yy, xx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    sx = A_out_to_src[0, 0] * xx + A_out_to_src[0, 1] * yy + A_out_to_src[0, 2]
    sy = A_out_to_src[1, 0] * xx + A_out_to_src[1, 1] * yy + A_out_to_src[1, 2]
    return bilinear_sample(img, sx, sy, fill=fill)


def unwarp_plate(img, corners_px, out_hw: Tuple[int, int]):
    """Rectify a plate crop given its 4 image corners.

    ``corners_px`` ordered [right-bottom, left-bottom, left-top, right-top]
    (PlateProjector order). Maps output (plate-aligned) pixels back into the
    image and samples — the on-device replacement for the reference's
    cv2.getPerspectiveTransform + warpPerspective unwarp
    (licence_plate_render/__init__.py:392-398).
    """
    oh, ow = out_hw
    dst = jnp.asarray(
        [[ow, oh], [0.0, oh], [0.0, 0.0], [ow, 0.0]], jnp.float32)
    H = homography_from_4pts(dst, corners_px)   # output px -> image px
    return warp_perspective(img, H, out_hw)


def make_scale_affine(scale_x, scale_y, rot_rad, out_cx, out_cy,
                      src_cx, src_cy):
    """(2, 3) output->source affine: rotate by ``rot_rad`` and scale about a
    centre, placing source centre (src_cx, src_cy) at output (out_cx, out_cy).

    Used by the on-device car/plate compositor in place of PIL's
    resize/rotate/paste chain (reference render_car.py:100-121).
    """
    c, s = jnp.cos(rot_rad), jnp.sin(rot_rad)
    # inverse of (scale then rotate): rotate by -r then unscale
    m00 = c / scale_x
    m01 = s / scale_x
    m10 = -s / scale_y
    m11 = c / scale_y
    t0 = src_cx - (m00 * out_cx + m01 * out_cy)
    t1 = src_cy - (m10 * out_cx + m11 * out_cy)
    return jnp.asarray([[m00, m01, t0], [m10, m11, t1]])


def np_project_corners(pose6d, camera: CameraIntrinsics = CameraIntrinsics(),
                       half_w: float = 199.5, half_h: float = 84.0):
    """Host/numpy twin of PlateProjector for tools and tests."""
    X, Y, Z, r1, r2, r3 = [float(v) for v in pose6d]
    c1, s1 = np.cos(r1), np.sin(r1)
    c2, s2 = np.cos(r2), np.sin(r2)
    c3, s3 = np.cos(r3), np.sin(r3)
    R1 = np.array([[1, 0, 0], [0, c1, -s1], [0, s1, c1]])
    R2 = np.array([[c2, 0, s2], [0, 1, 0], [-s2, 0, c2]])
    R3 = np.array([[c3, -s3, 0], [s3, c3, 0], [0, 0, 1]])
    P = np.array([[half_w, -half_w, -half_w, half_w],
                  [half_h, half_h, -half_h, -half_h],
                  [0, 0, 0, 0]], np.float64)
    K = np.array([[camera.fx, 0, camera.cx],
                  [0, camera.fy, camera.cy],
                  [0, 0, 1]], np.float64)
    ans = K @ (R3 @ R2 @ R1 @ P + np.array([[X], [Y], [Z]]))
    return (ans[:2] / ans[2:3]).T.astype(np.float32)
