"""Image-based visual servoing (IBVS) controller.

Port of the reference's drone-following PID controller
(agent_controller/IBVS_controller.py) with the control law factored out of
ROS/Tk so it is unit-testable and reusable:

* error terms (IBVS_controller.py:280-310, 360-393): x = depth (or box
  area) vs desired distance; y = viewpoint azimuth (confidence-weighted
  5-frame circular moving average) vs desired azimuth; z = height hold;
  w = horizontal image centring;
* per-axis PID with gains from an ``ibvs_parameter.yaml``-contract dict;
* body->world rotation by the vehicle heading; velocity bounding with a
  deadband; hover-and-spin recovery after LOSS_TARGET_MAX lost frames.

``IBVSNode`` (optional) wires the controller to the ROS topics of the
reference (/YOLO/box in, cmd_vel out); the Tk gain GUI is replaced by
plain setters — gains are just attributes.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_GAINS = {"xp": 1.0, "yp": 0.2, "zp": 0.4, "wp": 0.8}
AXES = "xyzw"


class VelocityCommand:
    __slots__ = ("x", "y", "z", "yaw_rate", "hovering")

    def __init__(self, x=0.0, y=0.0, z=0.0, yaw_rate=0.0, hovering=False):
        self.x, self.y, self.z = x, y, z
        self.yaw_rate = yaw_rate
        self.hovering = hovering

    def as_tuple(self):
        return (self.x, self.y, self.z, self.yaw_rate)


class AzimuthFilter:
    """Confidence-weighted circular moving average over the last N frames
    (IBVS_controller.py:360-385)."""

    def __init__(self, window: int = 5, num_bins: int = 24):
        self.window = window
        # true division: 360 // 16 = 22 would mis-space (and miscount)
        # the bin angles for any num_bins that does not divide 360
        ang = (np.arange(num_bins, dtype=np.float64)
               * (360.0 / num_bins)) * np.pi / 180.0
        self.cos_offset = np.cos(ang)
        self.sin_offset = np.sin(ang)
        self.queue: List[List[float]] = []

    def update(self, logits: Sequence[float]) -> float:
        x = np.asarray(logits, np.float64)
        e = np.exp(x - x.max())
        prob = e / e.sum()
        n = min(len(prob), len(self.cos_offset))
        c = float(np.sum(self.cos_offset[:n] * prob[:n]))
        s = float(np.sum(self.sin_offset[:n] * prob[:n]))
        ang = math.atan2(s, c)
        rad = (s * s + c * c) ** 0.5
        if len(self.queue) == self.window:
            self.queue.pop(0)
        self.queue.append([ang, rad])
        num = sum(a * r for a, r in self.queue)
        den = sum(r for _, r in self.queue) + 1e-5
        return num / den


class IBVSController:
    LOSS_TARGET_MAX = 30

    def __init__(self, gains: Optional[Dict[str, float]] = None,
                 desire_azimuth_deg: float = 0.0,
                 desire_distance: float = 1.5,
                 desire_z: float = 1.0,
                 desire_x_area: float = 0.3,
                 car_threshold: float = 0.1,
                 num_bins: int = 24):
        self.gain = dict(DEFAULT_GAINS)
        self.gain.update(gains or {})
        self.desire_azimuth = desire_azimuth_deg
        self.desire_distance = desire_distance
        self.desire_z = desire_z
        self.desire_x_area = desire_x_area
        self.car_threshold = car_threshold
        self.loss_target_counter = 0
        # PID memory: running integral + last error only — an hour-long
        # 30 Hz track must not grow a list and re-sum it every tick
        self.err_sum: Dict[str, float] = {ax: 0.0 for ax in AXES}
        self.err_last: Dict[str, Optional[float]] = {ax: None
                                                     for ax in AXES}
        self.azimuth_filter = AzimuthFilter(num_bins=num_bins)
        self.num_bins = num_bins
        self.uav_heading = 0.0
        self.uav_height = 0.0

    # -- state from the vehicle ------------------------------------------
    def set_pose(self, heading_rad: float, height: float):
        h = ((heading_rad + math.pi) % (2 * math.pi)) - math.pi
        self.uav_heading = h
        self.uav_height = height

    # -- one detection -> one command -------------------------------------
    def update(self, box: Sequence[float], dt: float = 1 / 30.0
               ) -> VelocityCommand:
        """``box`` is the detection layout published on /YOLO/box:
        [score, y, x, h, w, depth_or_azi, class_logits...]."""
        box = np.asarray(box, np.float64)
        if box[0] <= self.car_threshold:
            self.loss_target_counter += 1
            self.reset_errors()
            if self.loss_target_counter > self.LOSS_TARGET_MAX:
                # hover and slowly spin to re-acquire
                return VelocityCommand(yaw_rate=0.1, hovering=True)
            return VelocityCommand(hovering=True)

        self.loss_target_counter = 0
        if box[5] > 0:   # depth available
            errx = float(box[5]) - self.desire_distance
        else:            # fall back to apparent box area
            errx = self.desire_x_area - float(box[3] * box[4])

        erry = self.azimuth_filter.update(box[-self.num_bins:]) - \
            self.desire_azimuth * math.pi / 180.0
        erry = ((erry + math.pi) % (2 * math.pi)) - math.pi

        errz = (self.desire_z - self.uav_height) if self.desire_z > 0 \
            else (0.7 - float(box[1]))
        errw = 0.5 - float(box[2])

        err = {"x": errx, "y": erry, "z": errz, "w": errw}
        out = {}
        for ax in AXES:
            self.err_sum[ax] += err[ax]
            out[ax] = err[ax] * self.gain.get(ax + "p", 0.0)
            out[ax] += self.err_sum[ax] * self.gain.get(ax + "i", 0.0)
            if self.err_last[ax] is not None and dt > 0:
                d = (err[ax] - self.err_last[ax]) / dt
                out[ax] += d * self.gain.get(ax + "d", 0.0)
            self.err_last[ax] = err[ax]

        local_x = _bound(out["x"], 0.2, 0.05)
        local_y = _bound(out["y"], 0.2, 0.05)
        ch, sh = math.cos(self.uav_heading), math.sin(self.uav_heading)
        return VelocityCommand(
            x=local_x * ch - local_y * sh,
            y=local_y * ch + local_x * sh,
            z=out["z"], yaw_rate=out["w"])

    def reset_errors(self):
        for ax in AXES:
            self.err_sum[ax] = 0.0
            self.err_last[ax] = None


def _bound(x: float, high: float, low: float) -> float:
    x = float(np.clip(x, -high, high))
    return 0.0 if -low < x < low else x


class IBVSNode:
    """ROS wiring with the reference topic contract (requires rospy)."""

    def __init__(self, controller: IBVSController,
                 params: Optional[dict] = None):
        import rospy
        from geometry_msgs.msg import PoseStamped, TwistStamped
        from std_msgs.msg import Float32MultiArray
        p = params or {}
        self.ctl = controller
        rospy.init_node("IBVS_controller_node", anonymous=True)
        self._TwistStamped = TwistStamped
        self._t0 = rospy.get_rostime()
        self._rospy = rospy
        self.vel_pub = rospy.Publisher(
            p.get("CMD_VEL_TOPIC", "/ibvs_gui/cmd_vel"), TwistStamped,
            queue_size=1)
        rospy.Subscriber("/mavros/local_position/pose", PoseStamped,
                         self._pose_cb)
        rospy.Subscriber("/YOLO/box", Float32MultiArray, self._box_cb)

    def _pose_cb(self, pose):
        z = pose.pose.orientation.z
        w = pose.pose.orientation.w
        self.ctl.set_pose(math.atan2(z, w) * 2, pose.pose.position.z)

    def _box_cb(self, msg):
        now = self._rospy.get_rostime()
        dt = max((now - self._t0).to_sec(), 1e-3)
        self._t0 = now
        cmd = self.ctl.update(msg.data, dt)
        out = self._TwistStamped()
        out.header.stamp = now
        out.twist.linear.x = cmd.x
        out.twist.linear.y = cmd.y
        out.twist.linear.z = cmd.z
        out.twist.angular.z = cmd.yaw_rate
        self.vel_pub.publish(out)
