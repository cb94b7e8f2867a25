"""Video serving: frames in, detections/plates/characters out.

Replaces the reference's ROS video nodes (car/video_node.py,
licence_plate/LPD_video_node.py, car_and_LP/carLP_video_node.py), which
ran a hand-rolled two-thread pipeline with busy-wait flags and pushed
intermediate crops through ROS topics. Here:

* the whole cascade is one on-device program (yolo_tpu.pipeline), so
  there is nothing to hand between threads;
* throughput pipelining comes from jax's async dispatch — the node keeps
  one batch in flight while post-processing the previous batch's outputs
  on host (double buffering without threads);
* sinks are plain callbacks; the optional ROS adapter
  (serve/ros_bridge.py) republishes the reference topic contract.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Iterator, List, Optional, Tuple

import jax
import numpy as np

from yolo_tpu.decode import is_valid_taiwan_plate, peaks_to_text
from yolo_tpu.ops.image import flip_and_clip


class FrameSource:
    """Uniform frame supply: video file / camera index / image directory /
    synthetic renderer. Yields float32 RGB (H, W, 3) in [0, 1] with the
    reference's flip/clip preprocessing (yolo_cv.py:285-318)."""

    def __init__(self, dev: str = "synthetic", size_hw: Tuple[int, int] = (320, 512),
                 clip: Tuple[float, float] = (1.0, 1.0), flip: int = 3,
                 max_frames: Optional[int] = None,
                 topic: str = "/usb_cam/image_raw"):
        self.dev = dev
        self.size_hw = size_hw
        self.clip = clip
        self.flip = flip
        self.max_frames = max_frames
        self.topic = topic

    def __iter__(self) -> Iterator[np.ndarray]:
        h, w = self.size_hw
        count = 0
        if self.dev in ("synthetic", "synthetic_ocr"):
            from yolo_tpu.render import LPRenderer, procedural_backgrounds
            renderer = LPRenderer(h, w)
            key = jax.random.PRNGKey(0)
            while self.max_frames is None or count < self.max_frames:
                key, k1, k2 = jax.random.split(key, 3)
                bg = procedural_backgrounds(k1, 1, h, w)
                if self.dev == "synthetic_ocr":   # fronto-parallel strips
                    imgs, _ = renderer.render(k2, bg)
                else:                             # plates projected in scenes
                    imgs, _ = renderer.add(k2, bg, (45., 60., 45.),
                                           add_rate=0.9)
                yield np.asarray(imgs[0])
                count += 1
            return

        if self.dev == "ros":
            # subscribe to the image topic (reference video nodes read
            # /usb_cam/image_raw, car/video_node.py). Fails loudly when
            # no ROS runtime exists — falling through to cv2 used to
            # open VideoCapture('ros') and silently yield zero frames.
            from yolo_tpu.serve.ros_bridge import ros_available
            if not ros_available():
                raise RuntimeError(
                    "--dev ros requires a ROS runtime (rospy not found); "
                    "use --dev synthetic / a video path / ppm:<fifo>")
            import queue as _queue

            import cv2
            import rospy
            from cv_bridge import CvBridge
            from sensor_msgs.msg import Image as ImageMsg
            bridge = CvBridge()
            q: "_queue.Queue[np.ndarray]" = _queue.Queue(maxsize=4)

            def _cb(msg):
                try:
                    q.put_nowait(bridge.imgmsg_to_cv2(msg, "rgb8"))
                except _queue.Full:
                    pass                      # drop frames when behind

            if not rospy.core.is_initialized():
                rospy.init_node("yolo_tpu_video", anonymous=True)
            sub = rospy.Subscriber(self.topic, ImageMsg, _cb,
                                   queue_size=1)
            try:
                while self.max_frames is None or count < self.max_frames:
                    try:
                        img = q.get(timeout=5.0)
                    except _queue.Empty:
                        if rospy.is_shutdown():
                            return
                        continue
                    img = cv2.resize(img, (w, h))
                    yield self._pre(img.astype(np.float32) / 255.0)
                    count += 1
            finally:
                sub.unregister()
            return

        if self.dev.startswith(("ppm:", "raw:")):
            # native producer thread + lock-free ring (serve/native.py)
            from yolo_tpu.serve.native import FrameRing
            kind, path = self.dev.split(":", 1)
            ring = FrameRing(16, h, w)
            (ring.start_ppm_stream if kind == "ppm"
             else ring.start_raw_stream)(path)
            try:
                while self.max_frames is None or count < self.max_frames:
                    out = ring.pop_batch(1, h, w)
                    if out.shape[0] == 0:
                        if ring.eos:
                            return
                        time.sleep(0.002)
                        continue
                    yield self._pre(out[0])
                    count += 1
            finally:
                ring.close()
            return

        if os.path.isdir(self.dev):
            from PIL import Image
            for f in sorted(os.listdir(self.dev)):
                if not f.lower().endswith((".jpg", ".jpeg", ".png")):
                    continue
                im = Image.open(os.path.join(self.dev, f)).convert("RGB")
                im = im.resize((w, h), Image.BILINEAR)
                yield self._pre(np.asarray(im, np.float32) / 255.0)
                count += 1
                if self.max_frames and count >= self.max_frames:
                    return
            return

        import cv2
        cap = cv2.VideoCapture(int(self.dev) if self.dev.isdigit()
                               else self.dev)
        try:
            while self.max_frames is None or count < self.max_frames:
                ok, frame = cap.read()
                if not ok or frame is None:
                    return
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                frame = cv2.resize(frame, (w, h))
                yield self._pre(frame.astype(np.float32) / 255.0)
                count += 1
        finally:
            cap.release()

    def _pre(self, img: np.ndarray) -> np.ndarray:
        return np.asarray(flip_and_clip(img, self.clip, self.flip))


class VideoNode:
    """Streaming inference with software double-buffering.

    ``infer_fn(frames) -> result`` must be a jitted function over a fixed
    (B, H, W, 3) batch; frames are micro-batched to B. Sinks receive
    ``(batch_index, result, frames)`` with result already on host.
    """

    def __init__(self, infer_fn: Callable, batch: int = 1,
                 sinks: Optional[List[Callable]] = None):
        self.infer_fn = infer_fn
        self.batch = batch
        self.sinks = sinks or []

    def run(self, source: FrameSource, max_batches: Optional[int] = None):
        """``source`` may yield frames, or ``(frame, depth)`` pairs for
        RGB-D streams (the reference's ZED contract, car/video_node.py:
        235-243) — then ``infer_fn(frames, depth)`` is called and car
        slot 5 carries box-centre depth (pipeline.sample_depth_at_boxes).
        """
        pending = None          # (idx, device_result, host_frames)
        processed = 0
        buf, dbuf = [], []
        t0 = time.perf_counter()
        for item in source:
            if isinstance(item, tuple):
                frame, dep = item
                dbuf.append(dep)
            else:
                frame = item
            buf.append(frame)
            if len(buf) < self.batch:
                continue
            frames = np.stack(buf)
            depth = np.stack(dbuf) if dbuf else None
            buf, dbuf = [], []
            result = (self.infer_fn(frames, depth) if depth is not None
                      else self.infer_fn(frames))   # async dispatch
            if pending is not None:
                self._drain(*pending)
                processed += 1
                if max_batches and processed >= max_batches:
                    # budget reached: drop the just-dispatched batch
                    # instead of handing sinks max_batches+1 results
                    pending = None
                    break
            pending = (processed, result, frames)
        if pending is not None:
            self._drain(*pending)
            processed += 1
        dt = time.perf_counter() - t0
        return {"batches": processed,
                "fps": processed * self.batch / dt if dt > 0 else 0.0}

    def _drain(self, idx, result, frames):
        host = jax.tree_util.tree_map(np.asarray, result)
        for sink in self.sinks:
            sink(idx, host, frames)


class ShardedVideoNode(VideoNode):
    """Multi-chip batched stream inference.

    The reference served one stream per GPU process (car/video_node.py);
    here many streams' frames are stacked into one global batch whose
    leading axis is sharded over the mesh's ``data`` axis — each chip runs
    the identical fused pipeline on its shard and results come back as one
    addressable array. Scale-out is a sharding annotation, exactly like
    training (parallel.mesh); no NCCL/MPI analogue exists or is needed.

    ``infer_fn`` is the unjitted pipeline callable over (B, H, W, 3);
    the node jits it with the batch axis sharded. The global batch is
    ``per_device_batch * mesh.devices.size``.
    """

    def __init__(self, infer_fn: Callable, mesh,
                 per_device_batch: int = 1,
                 sinks: Optional[List[Callable]] = None):
        from yolo_tpu.parallel.mesh import batch_sharding
        self.mesh = mesh
        self.sharding = batch_sharding(mesh)
        n = int(mesh.devices.size)
        # a single (non-tuple) sharding broadcasts to every argument:
        # RGB frames and an optional aligned depth map are both
        # batch-leading, so each shards over the data axis identically
        sharded = jax.jit(infer_fn, in_shardings=self.sharding)
        super().__init__(sharded, batch=per_device_batch * n, sinks=sinks)


def make_ocr_text_sink(print_valid_only: bool = True,
                       collect: Optional[list] = None) -> Callable:
    """Sink turning pipeline OCR outputs into plate strings with the
    AAA-NNNN validity gate (OCR/OCR.py:150-157, 240-252)."""
    def sink(idx, result, frames):
        peaks = getattr(result, "ocr_cls", None)
        if peaks is None:
            return
        for row in np.asarray(peaks):
            text = peaks_to_text(row)
            ok = is_valid_taiwan_plate(text)
            if collect is not None:
                collect.append((text, ok))
            if text and (ok or not print_valid_only):
                print(f"[OCR] {text}{'' if ok else '  (invalid format)'}")
    return sink


def make_video_writer_sink(path: str, size_hw: Tuple[int, int],
                           draw: Optional[Callable] = None,
                           fps: int = 30) -> Callable:
    """Annotated-video sink (reference save_video path,
    car/video_node.py:114-124)."""
    import cv2
    h, w = size_hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, (w, h))

    def sink(idx, result, frames):
        for i, frame in enumerate(frames):
            img = (np.clip(frame, 0, 1) * 255).astype(np.uint8).copy()
            if draw is not None:
                img = draw(img, result, i)
            writer.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    sink.close = writer.release
    return sink
