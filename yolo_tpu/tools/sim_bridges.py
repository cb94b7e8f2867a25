"""Simulator / vehicle bridges (edge adapters, all optional deps).

* ``AirSimBridge`` — forwards IBVS velocity commands into an AirSim
  multirotor and republishes the sim camera (reference
  agent_controller/ibvs2airsim.py). Runs headless against the airsim
  python client; ROS layer optional.
* ``KeyboardTeleop`` — terminal teleop producing VelocityCommands (the
  role of agent_controller/ard_control.py and the offboard keyboard test
  nodes, minus Tk).
"""
from __future__ import annotations

import sys
import threading
import time
from typing import Callable, Optional

from yolo_tpu.tools.ibvs import VelocityCommand


class AirSimBridge:
    def __init__(self, ip: str = ""):
        import airsim  # optional dependency
        self.client = airsim.MultirotorClient(ip=ip)
        self.client.confirmConnection()
        self.client.enableApiControl(True)

    def takeoff(self):
        self.client.armDisarm(True)
        self.client.takeoffAsync().join()

    def send(self, cmd: VelocityCommand, duration: float = 0.1):
        import airsim
        self.client.moveByVelocityAsync(
            cmd.x, cmd.y, -cmd.z, duration,
            airsim.DrivetrainType.MaxDegreeOfFreedom,
            airsim.YawMode(True, cmd.yaw_rate * 57.29578))

    def land(self):
        self.client.landAsync().join()
        self.client.armDisarm(False)

    def camera_frame(self):
        """RGB frame from the sim front camera as numpy (H, W, 3)."""
        import airsim
        import numpy as np
        resp = self.client.simGetImages([airsim.ImageRequest(
            "0", airsim.ImageType.Scene, False, False)])[0]
        img = np.frombuffer(resp.image_data_uint8, np.uint8)
        return img.reshape(resp.height, resp.width, 3)


KEY_BINDINGS = {
    "w": VelocityCommand(x=0.5), "s": VelocityCommand(x=-0.5),
    "a": VelocityCommand(y=-0.5), "d": VelocityCommand(y=0.5),
    "r": VelocityCommand(z=0.5), "f": VelocityCommand(z=-0.5),
    "q": VelocityCommand(yaw_rate=0.5), "e": VelocityCommand(yaw_rate=-0.5),
    " ": VelocityCommand(),
}


class KeyboardTeleop:
    """Reads single keys from stdin and feeds VelocityCommands to a sink
    callback at a fixed rate (zero command when no key is held)."""

    def __init__(self, sink: Callable[[VelocityCommand], None],
                 rate_hz: float = 20.0):
        self.sink = sink
        self.rate_hz = rate_hz
        self._last = VelocityCommand()
        self._running = False

    def handle_key(self, ch: str):
        cmd = KEY_BINDINGS.get(ch)
        if cmd is not None:
            self._last = cmd

    def run(self, max_seconds: Optional[float] = None):
        self._running = True
        t0 = time.time()

        def reader():
            while self._running:
                ch = sys.stdin.read(1)
                if not ch:
                    break
                if ch == "x":
                    self._running = False
                    break
                self.handle_key(ch)

        th = threading.Thread(target=reader, daemon=True)
        th.start()
        while self._running:
            self.sink(self._last)
            time.sleep(1.0 / self.rate_hz)
            if max_seconds and time.time() - t0 > max_seconds:
                self._running = False
