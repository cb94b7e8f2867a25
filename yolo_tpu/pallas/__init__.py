"""Pallas TPU kernels for hot ops.

Kernels here are drop-in accelerations of ops that XLA schedules
suboptimally; every kernel has an XLA reference implementation it is
tested against, plus an interpret-mode path so the suite runs on CPU.
"""
from yolo_tpu.pallas.decode_kernel import best_cell_decode  # noqa: F401
