"""Flight-path recorder: plot the vehicle XY track coloured by whether
the OCR'd plate matches a target string.

Reference: Tools/record_px4_path.py — the end-to-end demo metric of the
whole stack (drone follows a car until the right licence plate is read).
Works offline from a log of (x, y, plate_text) tuples, or live from ROS
when rospy is importable.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple


def plot_path(track: Sequence[Tuple[float, float, str]], target: str,
              out_png: str = "path.png"):
    """track rows: (x, y, ocr_text). Points where ocr_text == target are
    drawn green, others red; saves a PNG and returns the match ratio."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = [t[0] for t in track]
    ys = [t[1] for t in track]
    hit = [t[2] == target for t in track]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111)
    ax.plot(xs, ys, "-", color="0.8", linewidth=1)
    ax.scatter([x for x, h in zip(xs, hit) if h],
               [y for y, h in zip(ys, hit) if h], c="g", s=12,
               label=f"match {target}")
    ax.scatter([x for x, h in zip(xs, hit) if not h],
               [y for y, h in zip(ys, hit) if not h], c="r", s=12,
               label="no match")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(out_png)
    plt.close(fig)
    return sum(hit) / max(len(hit), 1)


class LivePathRecorder:
    """ROS live variant: subscribes the local pose and /YOLO/OCR and
    accumulates the track (reference record_px4_path.py:16-60)."""

    def __init__(self, target: str):
        import rospy
        from geometry_msgs.msg import PoseStamped
        from std_msgs.msg import String
        self.target = target
        self.track: List[Tuple[float, float, str]] = []
        self._text = ""
        rospy.Subscriber("/mavros/local_position/pose", PoseStamped,
                         self._pose_cb)
        rospy.Subscriber("/YOLO/OCR", String, self._ocr_cb)

    def _ocr_cb(self, msg):
        self._text = msg.data

    def _pose_cb(self, pose):
        self.track.append((pose.pose.position.x, pose.pose.position.y,
                           self._text))

    def save(self, out_png: str = "path.png"):
        return plot_path(self.track, self.target, out_png)
