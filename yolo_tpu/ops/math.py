"""Small math primitives shared across the framework.

Semantics match the reference's numpy/nd helpers
(yolo_modules/yolo_gluon.py:365-377) but are plain jax functions usable
under jit/vmap/grad on any backend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid(x):
    return jax.nn.sigmoid(x)


def inv_sigmoid(x):
    """Logit. inv_sigmoid(sigmoid(t)) == t for t in a sane range."""
    return -jnp.log(1.0 / x - 1.0)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


def deg2rad(x):
    return x * (jnp.pi / 180.0)


def rad2deg(x):
    return x * (180.0 / jnp.pi)
