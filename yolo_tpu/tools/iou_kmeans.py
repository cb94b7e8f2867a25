"""K-means over box shapes with 1/IoU distance — anchor prior search.

Reference: yolo_modules/iou_kmeans.py:55-97 (nd loops + live matplotlib).
Here the whole Lloyd iteration is one jitted lax.scan: distances,
assignment and centroid update are batched device ops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_centred(hw, centres):
    """IoU of boxes (N, 2) vs centres (K, 2), all centred at the origin
    (the k-means metric uses shapes only). Returns (N, K)."""
    h = hw[:, None, 0]
    w = hw[:, None, 1]
    ch = centres[None, :, 0]
    cw = centres[None, :, 1]
    inter = jnp.minimum(h, ch) * jnp.minimum(w, cw)
    union = h * w + ch * cw - inter
    return inter / jnp.maximum(union, 1e-12)


@partial(jax.jit, static_argnums=(1, 2))
def iou_kmeans(hw, k: int = 9, iters: int = 50):
    """(N, 2) box (h, w) samples -> (k, 2) anchor centres."""
    hw = jnp.asarray(hw, jnp.float32)
    n = hw.shape[0]
    # init: spread over the sorted-by-area samples
    order = jnp.argsort(hw[:, 0] * hw[:, 1])
    init_idx = order[jnp.linspace(0, n - 1, k).astype(jnp.int32)]
    centres0 = hw[init_idx]

    def step(centres, _):
        d = 1.0 / jnp.maximum(_iou_centred(hw, centres), 1e-6)   # (N, K)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=hw.dtype)        # (N, K)
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new = (onehot.T @ hw) / counts[:, None]
        # keep old centre for empty clusters
        new = jnp.where((onehot.sum(0) > 0)[:, None], new, centres)
        return new, None

    centres, _ = jax.lax.scan(step, centres0, None, length=iters)
    return centres


def mean_best_iou(hw, centres) -> jnp.ndarray:
    """Anchor-quality metric: mean over samples of the best-centre IoU."""
    return jnp.mean(jnp.max(_iou_centred(jnp.asarray(hw, jnp.float32),
                                         jnp.asarray(centres, jnp.float32)),
                            axis=1))
