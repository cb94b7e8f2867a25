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
            msg.data = [float(v) for v in np.asarray(car[0])]
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
