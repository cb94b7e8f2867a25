"""Camera calibration helpers.

* ``publish_camera`` — webcam -> ROS image publisher for running the ROS
  calibration stack against (the reference's yolo_modules/yolo_ros.py).
* ``calibrate_chessboard`` — direct OpenCV chessboard calibration writing
  a camera_parameter-contract yaml (the file PlateProjector consumes),
  removing the ROS dependency from the calibration loop entirely.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import yaml


def calibrate_chessboard(images_dir: str, out_yaml: str,
                         board_size=(9, 6), square_mm: float = 24.0
                         ) -> Optional[dict]:
    """Calibrate from chessboard photos; returns the spec dict and writes
    a ROS-camera_info-format yaml compatible with CameraIntrinsics."""
    import cv2
    objp = np.zeros((board_size[0] * board_size[1], 3), np.float32)
    objp[:, :2] = np.mgrid[0:board_size[0],
                           0:board_size[1]].T.reshape(-1, 2) * square_mm
    obj_pts, img_pts = [], []
    shape = None
    for f in sorted(os.listdir(images_dir)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img = cv2.imread(os.path.join(images_dir, f))
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        shape = gray.shape[::-1]
        ok, corners = cv2.findChessboardCorners(gray, board_size)
        if ok:
            obj_pts.append(objp)
            img_pts.append(corners)
    if not obj_pts:
        return None
    ret, K, dist, _, _ = cv2.calibrateCamera(
        obj_pts, img_pts, shape, None, None)
    spec = {
        "image_width": int(shape[0]),
        "image_height": int(shape[1]),
        "camera_name": "calibrated",
        "camera_matrix": {"rows": 3, "cols": 3,
                          "data": [float(v) for v in K.reshape(-1)]},
        "distortion_model": "plumb_bob",
        "distortion_coefficients": {
            "rows": 1, "cols": len(dist.reshape(-1)),
            "data": [float(v) for v in dist.reshape(-1)]},
        "projection_matrix": {
            "rows": 3, "cols": 4,
            "data": [float(K[0, 0]), 0.0, float(K[0, 2]), 0.0,
                     0.0, float(K[1, 1]), float(K[1, 2]), 0.0,
                     0.0, 0.0, 1.0, 0.0]},
    }
    with open(out_yaml, "w") as f:
        yaml.safe_dump(spec, f)
    return spec


def publish_camera(device: int = 0, topic: str = "/usb_cam/image_raw",
                   fps: int = 30):
    """Webcam -> ROS publisher (requires rospy + cv2); the reference's
    calibration shim."""
    import cv2
    import rospy
    from cv_bridge import CvBridge
    from sensor_msgs.msg import Image
    rospy.init_node("calibration", anonymous=True)
    pub = rospy.Publisher(topic, Image, queue_size=1)
    bridge = CvBridge()
    cap = cv2.VideoCapture(device)
    rate = rospy.Rate(fps)
    while not rospy.is_shutdown():
        ok, img = cap.read()
        if ok:
            pub.publish(bridge.cv2_to_imgmsg(img, "bgr8"))
        rate.sleep()
    cap.release()
