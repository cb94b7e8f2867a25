"""Inference-rate harness (reference yolo_gluon.test_inference_rate,
yolo_modules/yolo_gluon.py:317-331): warm-up then timed cycles, printing
``Inference Rate = X`` — with the timing methodology that is actually
sound over an async/remote device transport (block once after the loop)."""
from __future__ import annotations

import time
from typing import Callable

import jax


def test_inference_rate(fn: Callable, *args, cycles: int = 100,
                        warmup: int = 10, batch: int = 1) -> float:
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(cycles):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = cycles * batch / dt
    print("Inference Rate = %.2f" % rate)
    return rate
