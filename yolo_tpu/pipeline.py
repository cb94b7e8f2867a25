"""Fused end-to-end inference pipelines.

In the reference, the ALPR cascade crossed process boundaries: the LPD
video node decoded poses and published an unwarped plate crop over ROS
(licence_plate/LPD_video_node.py, carLP_video_node.py:48-86), which the
OCR node consumed and answered on another topic (OCR/OCR.py:240-252).
Here the whole cascade — detector forward, pose decode, plate-corner
projection, perspective unwarp, OCR forward, peak decode (and for the
joint net, the car box + viewpoint decode) — is ONE jitted XLA program:
frames in, plates/boxes/characters out, no host round-trips.

Arbitrary frame sizes are letterboxed on device to the stride-aligned
network input, so e.g. 416x416 streams run on the 448x448-compiled
program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from yolo_tpu.decode import (cls2ang, decode_car, decode_car_pallas,
                             decode_car_topk, decode_lp, decode_lp_pallas,
                             decode_ocr, make_angle_offsets)
from yolo_tpu.ops.boxes import make_grid_tables
from yolo_tpu.ops.batched_geometry import (project_corners_batched,
                                           unwarp_plates_batched,
                                           unwarp_plates_matmul)
from yolo_tpu.ops.geometry import CameraIntrinsics, PlateProjector

OCR_HW = (160, 384)       # OCR input strip (reference OCR/OCR.py:219)

WARP_IMPLS = ("matmul", "gather")


def resolve_warp_impl(impl, spec=None) -> str:
    """Resolve + validate the rectification implementation.

    ``None`` falls through to the spec key ``warp_impl`` (so deployments
    pin it in spec.yaml next to the weights), then to 'matmul' — the
    chip-recorded A/B winner (reports/bench_warp_matmul.json 1433.7 FPS
    vs 1083.8 gather at equal cascade accuracy,
    reports/eval_warp_matmul.json). Anything outside WARP_IMPLS raises:
    a silent fall-through to gather would record a typo'd run as matmul.
    """
    if impl is None:
        impl = spec.get("warp_impl", "matmul") if spec is not None \
            else "matmul"
    if impl not in WARP_IMPLS:
        raise ValueError(
            f"warp_impl must be one of {WARP_IMPLS}, got {impl!r}")
    return impl


def _unwarp(images, corners, sample_hw, impl: str):
    """Select the rectification implementation: 'gather' (reduced-res
    flat-take bilinear) or 'matmul' (two-pass interpolation matmuls —
    ops.batched_geometry.unwarp_plates_matmul)."""
    if impl == "matmul":
        low = unwarp_plates_matmul(images, corners, sample_hw)
        if tuple(sample_hw) != OCR_HW:
            low = jax.image.resize(
                low, (low.shape[0],) + OCR_HW + (low.shape[3],), "bilinear")
        return low
    return unwarp_plates_batched(images, corners, OCR_HW,
                                 sample_hw=sample_hw)


class ALPRResult(NamedTuple):
    lp: jnp.ndarray         # (B, 7) [score, X, Y, Z, r1, r2, r3]
    corners: jnp.ndarray    # (B, 4, 2) plate corners in input px
    crops: jnp.ndarray      # (B, 160, 384, 3) unwarped plates
    ocr_scores: jnp.ndarray  # (B, 24)
    ocr_cls: jnp.ndarray    # (B, 24) peak classes, -1 elsewhere


class JointResult(NamedTuple):
    car: jnp.ndarray        # (B, 6+C) [score, y, x, h, w, azi, logits...]
                            # (yxhw, decode_car semantics; decode.py:42).
                            # (B, topk, 6+C) LTRB when the pipeline has
                            # topk>0 (decode_car_topk / nms_topk)
    lp: jnp.ndarray
    corners: jnp.ndarray    # (B, 4, 2) plate corners in CALLER-FRAME px
                            # (letterbox offset/scale already undone)
    crops: jnp.ndarray
    ocr_scores: jnp.ndarray
    ocr_cls: jnp.ndarray


def pad_frames_to(images, target_hw: Tuple[int, int], fill: float = 0.5):
    """Letterbox (B, h, w, 3) frames onto the network input canvas:
    centre-pad when smaller, aspect-preserving downscale + pad when
    larger (a 480x640 stream on a 448x448 net must not trace-error)."""
    B, H, W, C = images.shape
    th, tw = target_hw
    if (H, W) == (th, tw):
        return images
    sh, sw, dy, dx = letterbox_geometry((H, W), target_hw)
    if (sh, sw) != (H, W):
        images = jax.image.resize(images, (B, sh, sw, C), "bilinear")
    canvas = jnp.full((B, th, tw, C), fill, images.dtype)
    return jax.lax.dynamic_update_slice(canvas, images, (0, dy, dx, 0))


def letterbox_geometry(frame_hw, target_hw):
    """Static letterbox placement: (content_h, content_w, dy, dx) of the
    frame content inside the canvas. All Python ints at trace time."""
    H, W = frame_hw
    th, tw = target_hw
    if H <= th and W <= tw:
        sh, sw = H, W
    else:
        scale = min(th / H, tw / W)
        sh, sw = max(1, int(round(H * scale))), max(1, int(round(W * scale)))
    return sh, sw, (th - sh) // 2, (tw - sw) // 2


def align_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _to_frame_coords(car, corners, frame_hw, net_hw, topk: int):
    """Map canvas-space outputs back to the caller's frame.

    Decode normalises boxes to the net canvas and corners are canvas px;
    sinks receive the ORIGINAL (unpadded) frames, so without this every
    consumer draws letterbox-offset boxes. Identity when frame == canvas
    (all eval paths render at spec.size)."""
    fh, fw = frame_hw
    nh, nw = net_hw
    if (fh, fw) == (nh, nw):
        return car, corners
    sh, sw, dy, dx = letterbox_geometry(frame_hw, net_hw)
    # content px -> frame px is a pure scale (fh/sh); canvas px first
    # subtracts the pad offset
    corners = (corners - jnp.asarray([dx, dy], corners.dtype)) * \
        jnp.asarray([fw / sw, fh / sh], corners.dtype)
    if topk:
        l, t, r, b = (car[..., 1], car[..., 2], car[..., 3], car[..., 4])
        box = jnp.stack([(l * nw - dx) / sw, (t * nh - dy) / sh,
                         (r * nw - dx) / sw, (b * nh - dy) / sh], -1)
    else:
        y, x, h, w = car[..., 1], car[..., 2], car[..., 3], car[..., 4]
        box = jnp.stack([(y * nh - dy) / sh, (x * nw - dx) / sw,
                         h * nh / sh, w * nw / sw], -1)
    car = jnp.concatenate([car[..., :1], box, car[..., 5:]], -1)
    return car, corners


def sample_depth_at_boxes(depth, car, topk: int):
    """Depth at each detected box centre, vectorised as one gather.

    ``depth``: (B, H, W) f32 aligned with the caller's frames. ``car``:
    frame-normalised rows from _to_frame_coords — [score, y, x, h, w, ...]
    (argmax mode) or [score, l, t, r, b, ...] per top-k row. Matches the
    reference's nearest-pixel read ``net_dep[int(H*y), int(W*x)]``
    (car/video_node.py:238-240)."""
    B, H, W = depth.shape
    if topk:
        cy = (car[..., 2] + car[..., 4]) * 0.5
        cx = (car[..., 1] + car[..., 3]) * 0.5
    else:
        cy, cx = car[..., 1], car[..., 2]
    yi = jnp.clip((cy * H).astype(jnp.int32), 0, H - 1)
    xi = jnp.clip((cx * W).astype(jnp.int32), 0, W - 1)
    flat = depth.reshape(B, H * W)
    idx = yi * W + xi                       # (B,) or (B, k)
    return jnp.take_along_axis(
        flat, idx.reshape(B, -1), axis=1).reshape(idx.shape)


class ALPRPipeline:
    """LPD (LPDenseNet) -> unwarp -> OCR, one program.

    ``unwarp_sample_hw``: gather resolution for the plate rectification
    (densely upsampled to the OCR strip afterwards). Detected plates span
    far fewer source pixels than 160x384, and random-access gathers are
    TPU's slowest primitive, so reduced sampling is ~5x faster than
    full-resolution. (64, 160) is the default: the recorded cascade A/B
    (reports/eval_unwarp_{64x160,80x192}.json) shows identical accuracy
    to (80, 192) within noise.
    """

    def __init__(self, lp_task, ocr_task,
                 camera: CameraIntrinsics = CameraIntrinsics(),
                 unwarp_sample_hw=(64, 160), warp_impl: str = None,
                 decode_impl: str = "xla"):
        self.lp_task = lp_task
        self.ocr_task = ocr_task
        self.spec = lp_task.spec
        self.projector = PlateProjector(camera=camera)
        self.unwarp_sample_hw = unwarp_sample_hw
        self.warp_impl = resolve_warp_impl(warp_impl, self.spec)
        self._decode_lp = (decode_lp_pallas if decode_impl == "pallas"
                           else decode_lp)

    def _unwarp_batch(self, images, lp_pred, input_hw):
        # natively batched projection + one-gather warp: the vmapped
        # scalar formulation stalls the TPU compiler (ops.batched_geometry)
        corners = project_corners_batched(
            lp_pred[:, 1:7], self.projector.camera, input_hw)
        crops = _unwarp(images.astype(self.lp_task.dtype), corners,
                        self.unwarp_sample_hw, self.warp_impl)
        return corners, crops

    def __call__(self, lp_variables, ocr_variables, images) -> ALPRResult:
        input_hw = images.shape[1:3]
        lp_map = self.lp_task.apply_eval(lp_variables, images)
        lp_pred = self._decode_lp(lp_map.astype(jnp.float32),
                                  self.spec.LP_r_max)
        corners, crops = self._unwarp_batch(images, lp_pred, input_hw)
        score_x, class_x = self.ocr_task.apply_eval(ocr_variables, crops)
        ocr = decode_ocr(score_x.astype(jnp.float32),
                         class_x.astype(jnp.float32))
        return ALPRResult(lp=lp_pred, corners=corners, crops=crops,
                          ocr_scores=ocr.scores, ocr_cls=ocr.peak_cls)

    def jit(self):
        return jax.jit(self.__call__)


class JointPipeline:
    """CarLPNet -> car box + viewpoint + LP pose -> unwarp -> OCR."""

    def __init__(self, joint_task, ocr_task,
                 camera: CameraIntrinsics = CameraIntrinsics(),
                 unwarp_sample_hw=(64, 160), warp_impl: str = None,
                 decode_impl: str = "xla", topk: int = 0,
                 nms_iou: float = 0.45):
        self.joint_task = joint_task
        self.ocr_task = ocr_task
        self.spec = joint_task.spec
        self.projector = PlateProjector(camera=camera)
        self.unwarp_sample_hw = unwarp_sample_hw
        self.warp_impl = resolve_warp_impl(warp_impl, self.spec)
        # topk > 0: multi-object serving — JointResult.car becomes
        # (B, topk, 6+C) NMS-kept rows instead of the reference-parity
        # argmax (B, 6+C) (car/YOLO.py:584 takes one box per image)
        self.topk = int(topk)
        self.nms_iou = nms_iou
        self._decode_lp = (decode_lp_pallas if decode_impl == "pallas"
                           else decode_lp)
        self._decode_car = (decode_car_pallas if decode_impl == "pallas"
                            else decode_car)
        self.grids = make_grid_tables(
            self.spec.size, self.spec.steps, self.spec.all_anchors)
        self.cos_off, self.sin_off = make_angle_offsets(self.spec.classes)

    def __call__(self, joint_variables, ocr_variables, frames,
                 depth=None) -> JointResult:
        """``depth`` (optional, (B, H, W) f32 in the CALLER's frame, e.g.
        a ZED/RGBD stream aligned with ``frames``): when given, car slot
        5 carries the depth sampled at each detected box centre — the
        reference's data[5]-is-depth contract (car/video_node.py:235-243;
        there the subsequent azimuth write clobbered it, here the caller
        chooses). Without depth, slot 5 is the circular-expectation
        azimuth as before; consumers can always recover azimuth from the
        class logits via ops.math.cls2ang."""
        spec = self.spec
        net_hw = tuple(spec.size)
        images = pad_frames_to(frames, net_hw)
        car_out, lp_map = self.joint_task.apply_eval(joint_variables, images)
        car_out = [o.astype(jnp.float32) for o in car_out]

        if self.topk:
            car = decode_car_topk(car_out, self.grids, spec.slice_point,
                                  spec.size, k=self.topk,
                                  iou_thresh=self.nms_iou)   # (B, k, 6+C)
        else:
            car = self._decode_car(car_out, self.grids, spec.slice_point,
                                   spec.size)                # (B, 6+C)
        # slot 5 <- circular-expectation azimuth (video_node.py:245-251);
        # cls2ang broadcasts over leading dims, so this covers both shapes
        azi, _rad = cls2ang(car[..., 0], car[..., 6:],
                            self.cos_off, self.sin_off)
        car = car.at[..., 5].set(azi)

        lp_pred = self._decode_lp(lp_map.astype(jnp.float32), spec.LP_r_max)

        corners = project_corners_batched(
            lp_pred[:, 1:7], self.projector.camera, net_hw)
        crops = _unwarp(images.astype(self.joint_task.dtype), corners,
                        self.unwarp_sample_hw, self.warp_impl)

        score_x, class_x = self.ocr_task.apply_eval(ocr_variables, crops)
        ocr = decode_ocr(score_x.astype(jnp.float32),
                         class_x.astype(jnp.float32))
        car, corners = _to_frame_coords(
            car, corners, tuple(frames.shape[1:3]), net_hw, self.topk)
        if depth is not None:
            car = car.at[..., 5].set(
                sample_depth_at_boxes(depth, car, self.topk))
        return JointResult(car=car, lp=lp_pred, corners=corners, crops=crops,
                           ocr_scores=ocr.scores, ocr_cls=ocr.peak_cls)

    def jit(self, donate: bool = False):
        """``donate=True`` donates the frames buffer to the program —
        streaming callers that upload a fresh batch every step can reuse
        its device memory for the outputs."""
        return jax.jit(self.__call__, donate_argnums=(2,) if donate else ())

    def packed_sections(self):
        """(name, start, end) column spans of ``packed_call``'s output.

        Static — derived from the spec, no tracing. ``ocr_cls`` rides as
        f32 (small ints are exact); crops are intentionally ABSENT: the
        serving artifact must never ship the (B, 160, 384, 3) rectified
        plates over a latency/bandwidth-bound transport — OCR text
        decodes from the peak sections on the host."""
        # decode_car rows: [score, y, x, h, w, azi] + one logit per class
        car_w = 6 + len(self.spec.classes)
        if self.topk:
            car_w *= self.topk
        widths = [("car", car_w), ("lp", 7), ("corners", 8),
                  ("ocr_scores", 24), ("ocr_cls", 24)]
        spans, off = [], 0
        for name, w in widths:
            spans.append((name, off, off + w))
            off += w
        return spans

    def packed_call(self, joint_variables, ocr_variables, frames,
                    depth=None):
        """Serving-mode forward: ONE flat (B, K) f32 tensor holding every
        compact JointResult field (no crops), sliced by
        ``packed_sections``. Remote/native transports (the C++ PJRT node,
        a network hop) pay one d2h latency wave per batch instead of
        five; the reference's node published five ROS messages per frame
        (car/video_node.py:216-254)."""
        r = self(joint_variables, ocr_variables, frames, depth=depth)
        outs = (r.car, r.lp, r.corners, r.ocr_scores, r.ocr_cls)
        B = frames.shape[0]
        packed = jnp.concatenate(
            [o.reshape(B, -1).astype(jnp.float32) for o in outs], axis=1)
        assert packed.shape[1] == self.packed_sections()[-1][-1], (
            packed.shape, self.packed_sections())
        return packed

    def aot_compile(self, joint_variables, ocr_variables, batch: int,
                    frame_hw: Optional[Tuple[int, int]] = None):
        """Ahead-of-time compile for a fixed batch/frame shape — the
        deployment path replacing the reference's MXNet symbol executors /
        TensorRT engines (yolo_gluon.py:204-242, tensorrt_module.py)."""
        h, w = frame_hw or self.spec.size
        dummy = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
        return jax.jit(self.__call__).lower(
            joint_variables, ocr_variables, dummy).compile()
