"""PX4/MAVROS offboard adapter — the last link of the reference's
detector -> OCR -> IBVS -> autopilot chain.

Reference twin: yolo_ws/src/offb/src/offb_vel.cpp (ROS1 C++). Semantics
kept:

* subscribes the IBVS velocity command (/ibvs_gui/cmd_vel), a fly-mode
  int (/ibvs_gui/fly_mode) and a land flag (/ibvs_gui/land);
* publishes position setpoints (/mavros/setpoint_position/local) or
  velocity setpoints (/mavros/setpoint_velocity/cmd_vel) at a fixed rate;
* fly modes: 0 = descend at -0.2 m/s, 1 = keyboard-adjusted position
  hold, 2 = forward the IBVS twist, hovering if the last command is
  older than 1 s (offb_vel.cpp "Loss Command, Hovering");
* requests OFFBOARD mode / arming at most every 5 s until granted;
* land: switch to MANUAL, disarm, reset the position setpoint.

The control law lives in :class:`OffboardStateMachine` — pure and
unit-testable without ROS; :class:`OffboardNode` is the thin rospy shim.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

MODE_DOWN = 0
MODE_POSITION = 1
MODE_VELOCITY = 2

HOVER = (0.0, 0.0, 0.0, 0.0)
DOWN = (0.0, 0.0, -0.2, 0.0)
STALE_AFTER_S = 1.0
REQUEST_INTERVAL_S = 5.0

# keyboard increments (offb_vel.cpp:188-206)
_KEYMAP = {
    "w": (0, +0.05), "s": (0, -0.05),
    "a": (1, +0.05), "d": (1, -0.05),
    "up": (2, +0.1), "down": (2, -0.1),
}


@dataclass
class OffboardStateMachine:
    """Pure offboard control logic: feed it FCU state + IBVS commands,
    read back the setpoint to publish and the service calls to make."""

    setpoint: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.8])
    fly_mode: int = MODE_POSITION
    land: bool = False
    _last_request: float = -1e9
    _last_twist: Tuple[float, float, float, float] = HOVER
    _last_twist_time: float = -1e9

    # ---- inputs ------------------------------------------------------
    def on_twist(self, vx, vy, vz, yaw_rate, stamp: float):
        self._last_twist = (float(vx), float(vy), float(vz),
                            float(yaw_rate))
        self._last_twist_time = float(stamp)

    def on_fly_mode(self, mode: int):
        self.fly_mode = int(mode)

    def on_land(self, land: bool):
        self.land = bool(land)
        if land:
            self.setpoint = [0.0, 0.0, 0.8]

    def on_key(self, key: str) -> bool:
        """w/s/a/d/up/down position nudges; returns True if consumed."""
        hit = _KEYMAP.get(key)
        if hit is None:
            return False
        axis, delta = hit
        self.setpoint[axis] += delta
        return True

    # ---- outputs -----------------------------------------------------
    def service_requests(self, now: float, fcu_mode: str, armed: bool
                         ) -> List[Tuple[str, object]]:
        """[(request, arg)] to send this tick: mode switch before arming,
        each at most every REQUEST_INTERVAL_S (offb_vel.cpp:165-182);
        landing demands MANUAL + disarm immediately."""
        if self.land:
            return [("set_mode", "MANUAL"), ("arm", False)]
        if now - self._last_request <= REQUEST_INTERVAL_S:
            return []
        if fcu_mode != "OFFBOARD":
            self._last_request = now
            return [("set_mode", "OFFBOARD")]
        if not armed:
            self._last_request = now
            return [("arm", True)]
        return []

    def setpoint_out(self, now: float):
        """("position", [x, y, z]) or ("velocity", (vx, vy, vz, yaw_rate))
        — what to publish this tick (offb_vel.cpp:214-240)."""
        if self.land:
            return ("position", list(self.setpoint))
        if self.fly_mode == MODE_DOWN:
            return ("velocity", DOWN)
        if self.fly_mode == MODE_POSITION:
            return ("position", list(self.setpoint))
        # MODE_VELOCITY: forward IBVS commands while fresh, hover when the
        # stream goes quiet
        if now - self._last_twist_time < STALE_AFTER_S:
            return ("velocity", self._last_twist)
        return ("velocity", HOVER)


class OffboardNode:
    """rospy wiring of the state machine (same topic contract as the
    reference node)."""

    def __init__(self, rate_hz: float = 100.0, warmup_setpoints: int = 100):
        import rospy
        from geometry_msgs.msg import PoseStamped, TwistStamped
        from mavros_msgs.msg import State
        from mavros_msgs.srv import CommandBool, SetMode
        from std_msgs.msg import Bool, Int8

        self.sm = OffboardStateMachine()
        self._rospy = rospy
        self._PoseStamped = PoseStamped
        self._TwistStamped = TwistStamped
        self.rate_hz = rate_hz
        self.warmup = warmup_setpoints
        self.fcu_mode = ""
        self.armed = False

        rospy.init_node("offb_vel_node", anonymous=True)
        rospy.Subscriber("/mavros/state", State, self._state_cb)
        rospy.Subscriber("/ibvs_gui/cmd_vel", TwistStamped, self._vel_cb)
        rospy.Subscriber("/ibvs_gui/fly_mode", Int8,
                         lambda m: self.sm.on_fly_mode(m.data))
        rospy.Subscriber("/ibvs_gui/land", Bool,
                         lambda m: self.sm.on_land(m.data))
        self.pos_pub = rospy.Publisher(
            "/mavros/setpoint_position/local", PoseStamped, queue_size=1)
        self.vel_pub = rospy.Publisher(
            "/mavros/setpoint_velocity/cmd_vel", TwistStamped, queue_size=1)
        self.arming = rospy.ServiceProxy("/mavros/cmd/arming", CommandBool)
        self.set_mode = rospy.ServiceProxy("/mavros/set_mode", SetMode)

    def _state_cb(self, msg):
        self.fcu_mode = msg.mode
        self.armed = msg.armed

    def _vel_cb(self, msg):
        self.sm.on_twist(msg.twist.linear.x, msg.twist.linear.y,
                         msg.twist.linear.z, msg.twist.angular.z,
                         msg.header.stamp.to_sec())

    def _publish(self, kind, value):
        if kind == "position":
            msg = self._PoseStamped()
            (msg.pose.position.x, msg.pose.position.y,
             msg.pose.position.z) = value
            msg.pose.orientation.w = 1.0
            self.pos_pub.publish(msg)
        else:
            msg = self._TwistStamped()
            msg.header.stamp = self._rospy.Time.now()
            (msg.twist.linear.x, msg.twist.linear.y, msg.twist.linear.z,
             msg.twist.angular.z) = value
            self.vel_pub.publish(msg)

    def spin(self):
        rospy = self._rospy
        rate = rospy.Rate(self.rate_hz)
        # stream setpoints before requesting OFFBOARD (PX4 requirement,
        # offb_vel.cpp:122-127)
        for _ in range(self.warmup):
            if rospy.is_shutdown():
                return
            self._publish(*self.sm.setpoint_out(time.time()))
            rate.sleep()
        while not rospy.is_shutdown():
            now = time.time()
            for req, arg in self.sm.service_requests(
                    now, self.fcu_mode, self.armed):
                try:
                    if req == "set_mode":
                        self.set_mode(custom_mode=arg)
                    else:
                        self.arming(arg)
                except Exception:
                    pass
            self._publish(*self.sm.setpoint_out(now))
            rate.sleep()


def main():
    OffboardNode().spin()


if __name__ == "__main__":
    main()
