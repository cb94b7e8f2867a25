"""Training observability.

The reference logged loss scalars to TensorBoard via mxboard every 10
steps plus a Mean_IOU validation scalar (yolo_modules/yolo_gluon.py:16-40,
car/YOLO.py:536-549). Here: a JSONL metric stream (always) plus TensorBoard
event files when torch's writer is importable, under the same
``<version>/logs`` layout.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricWriter:
    def __init__(self, logdir: str, exp: str = "", use_tensorboard: bool = True):
        self.logdir = logdir
        self.exp = exp
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=logdir)
            except Exception:
                self._tb = None

    def scalars(self, values: Dict[str, float], step: int):
        rec = {"step": int(step), "time": time.time(), "exp": self.exp}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{self.exp}/{k}" if self.exp else k,
                                    float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
