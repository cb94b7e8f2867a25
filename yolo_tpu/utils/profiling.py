"""Profiling utilities.

The reference's observability was wall-clock prints behind a verbose flag
(yolo_gluon.test_inference_rate, switch_print). Here: a jax.profiler
trace context producing TensorBoard/Perfetto traces, plus a
remote-transport-safe stage timer (host-readback barriers — see the
verify skill's timing notes; block_until_ready can be a no-op on
tunnelled devices).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/yolo_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _force(x) -> float:
    """Host readback of a scalar derived from a pytree — the reliable
    completion barrier on remote transports."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0]).reshape(-1)[0]) if leaves else 0.0


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2
            ) -> Dict[str, float]:
    """Wall-clock a jitted fn with sound barriers. Returns ms/iter stats.

    Dispatches ``iters`` calls then reads back from the LAST result (the
    device executes FIFO, so that forces all of them); also reports the
    single-call latency including the host round trip.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        _force(out)

    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    single = (time.perf_counter() - t0) * 1000

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    amortized = (time.perf_counter() - t0) / iters * 1000
    return {"ms_per_iter": amortized, "single_call_ms": single,
            "iters": iters}
