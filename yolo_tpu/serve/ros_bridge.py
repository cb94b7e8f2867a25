"""Optional ROS 1 adapters keeping the reference topic contract.

The reference's inter-process dataflow was ROS topics: annotated frames
on ``/YOLO/img``, car detections on ``/YOLO/box`` (Float32MultiArray),
plate pose on ``/YOLO/LP``, the unwarped plate on ``/YOLO/clipped_LP``
and plate text on ``/YOLO/OCR`` (car/v1/spec.yaml pub_* keys,
carLP_video_node.py, OCR/OCR.py:244-245). In this framework the cascade
runs in one process/program, so these publishers exist only as *edge*
adapters for downstream consumers (e.g. the IBVS controller). Everything
degrades gracefully when rospy is absent.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def ros_available() -> bool:
    try:
        import rospy  # noqa: F401
        return True
    except Exception:
        return False


class RosPublisher:
    """Publishes pipeline results on the reference topics. Construct only
    when ``ros_available()``; use as a VideoNode sink."""

    def __init__(self, spec, node_name: str = "YOLO_ros_node"):
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image
        from std_msgs.msg import Float32MultiArray, String

        rospy.init_node(node_name, anonymous=True)
        self.bridge = CvBridge()
        self._img = rospy.Publisher(
            spec.get("pub_img", "/YOLO/img"), Image, queue_size=1)
        self._box = rospy.Publisher(
            spec.get("pub_box", "/YOLO/box"), Float32MultiArray, queue_size=1)
        self._lp = rospy.Publisher(
            spec.get("pub_LP", "/YOLO/LP"), Float32MultiArray, queue_size=1)
        self._clip = rospy.Publisher(
            spec.get("pub_clipped_LP", "/YOLO/clipped_LP"), Image,
            queue_size=1)
        self._ocr = rospy.Publisher(
            spec.get("pub_OCR", "/YOLO/OCR"), String, queue_size=0)
        self._Float32MultiArray = Float32MultiArray
        self._String = String

    def __call__(self, idx, result, frames):
        from yolo_tpu.decode import peaks_to_text
        car = getattr(result, "car", None)
        if car is not None:
            msg = self._Float32MultiArray()
            # flat row-major; (topk, 6+C) multi-object rows publish as
            # topk consecutive boxes on the same topic
            msg.data = [float(v) for v in np.asarray(car[0]).reshape(-1)]
            self._box.publish(msg)
        lp = getattr(result, "lp", None)
        if lp is not None:
            msg = self._Float32MultiArray()
            msg.data = [float(v) for v in np.asarray(lp[0])]
            self._lp.publish(msg)
        crops = getattr(result, "crops", None)
        if crops is not None:
            img = (np.clip(np.asarray(crops[0]), 0, 1) * 255).astype(np.uint8)
            self._clip.publish(self.bridge.cv2_to_imgmsg(img, "rgb8"))
        peaks = getattr(result, "ocr_cls", None)
        if peaks is not None:
            text = peaks_to_text(np.asarray(peaks[0]))
            if text:
                self._ocr.publish(self._String(text))
        frame = (np.clip(frames[0], 0, 1) * 255).astype(np.uint8)
        self._img.publish(self.bridge.cv2_to_imgmsg(frame, "rgb8"))

class OcrRosNode:
    """Standalone OCR service node: subscribes the unwarped plate image
    topic, runs the jitted OCR decode, answers plate text — the interop
    twin of the reference's OCR video mode (OCR/OCR.py:240-252), for
    third-party detectors that publish ``/YOLO/clipped_LP`` themselves.
    (The fused pipelines never need this hop.)

    ``infer_fn(crop_batch) -> (scores, peak_cls)`` over a
    (1, 160, 384, 3) float32 batch; build it with
    ``make_ocr_infer(task, variables)``.
    """

    def __init__(self, infer_fn, spec, node_name: str = "OCR_ros_node",
                 valid_only: bool = True):
        import rospy
        from cv_bridge import CvBridge
        from sensor_msgs.msg import Image
        from std_msgs.msg import String

        self.infer_fn = infer_fn
        self.valid_only = valid_only
        self.bridge = CvBridge()
        rospy.init_node(node_name, anonymous=True)
        self._pub = rospy.Publisher(
            spec.get("pub_OCR", "/YOLO/OCR"), String, queue_size=0)
        self._String = String
        rospy.Subscriber(spec.get("sub_clipped_LP", "/YOLO/clipped_LP"),
                         Image, self._cb, queue_size=1, buff_size=2 ** 22)
        self._rospy = rospy

    def _cb(self, msg):
        import cv2
        from yolo_tpu.decode import is_valid_taiwan_plate, peaks_to_text
        img = self.bridge.imgmsg_to_cv2(msg, "rgb8")
        if img.shape[:2] != (160, 384):
            img = cv2.resize(img, (384, 160))
        batch = (np.asarray(img, np.float32) / 255.0)[None]
        _scores, peaks = self.infer_fn(batch)
        text = peaks_to_text(np.asarray(peaks[0]))
        if text and (not self.valid_only or is_valid_taiwan_plate(text)):
            self._pub.publish(self._String(text))

    def spin(self):
        self._rospy.spin()


def make_ocr_infer(ocr_task, variables):
    """Jitted (1, 160, 384, 3) -> (scores, peak_cls) for OcrRosNode."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.decode import decode_ocr

    def fn(crops):
        score_x, class_x = ocr_task.apply_eval(variables, crops)
        o = decode_ocr(score_x.astype(jnp.float32),
                       class_x.astype(jnp.float32))
        return o.scores, o.peak_cls
    return jax.jit(fn)
