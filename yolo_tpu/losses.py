"""Loss functions with mxnet.gluon semantics.

The reference trains with gluon's LogisticLoss(label_format='binary'),
HuberLoss(rho=1) and SoftmaxCrossEntropyLoss(from_logits=False,
sparse_label=False), each taking an elementwise sample_weight that is
multiplied in before averaging over all non-batch axes
(car/YOLO.py:185-190, 491-498; licence_plate/LP_detection.py:238-241,
354-360; OCR/OCR.py:103-118). These twins reproduce that weighting/
reduction exactly so loss scales in reference spec.yaml files transfer.

All functions return a (batch,) vector; callers mean() it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(x, weight):
    """Apply elementwise weight then mean over non-batch axes."""
    if weight is not None:
        x = x * weight
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1)


def logistic_loss(pred, label, weight=None):
    """Binary logistic loss on raw scores.

    gluon semantics: labels in {0, 1} are mapped to {-1, +1} and
    loss = log(1 + exp(-pred * label±)) via softplus (numerically stable).
    """
    pm = pred * (2.0 * label - 1.0)
    loss = jax.nn.softplus(-pm)
    return _reduce(loss, weight)


def huber_loss(pred, label, weight=None, rho: float = 1.0):
    """gluon HuberLoss semantics exactly: (0.5/rho)*err^2 inside the
    quadratic zone, err - 0.5*rho outside — so reference spec loss
    scales transfer for ANY rho, not just the default 1."""
    err = jnp.abs(pred - label)
    loss = jnp.where(err < rho, (0.5 / rho) * err * err, err - 0.5 * rho)
    return _reduce(loss, weight)


def softmax_ce_loss(pred_logits, label_probs, weight=None):
    """Dense-label softmax cross entropy: -sum(p * log_softmax(x), -1).

    ``weight`` broadcasts against the class-reduced (..., 1) loss — gluon
    applies the sample weight after the class-axis reduction.
    """
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    loss = -jnp.sum(label_probs * logp, axis=-1, keepdims=True)
    return _reduce(loss, weight)


def softmax_ce_sparse(pred_logits, label_idx, weight=None, num_classes=None):
    """Sparse-label variant (OCR class head). Invalid labels (< 0) must be
    masked out by ``weight`` — matches OCR/OCR.py:114 where score_y is the
    sample weight."""
    n = num_classes or pred_logits.shape[-1]
    safe = jnp.clip(label_idx, 0, n - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, n, dtype=pred_logits.dtype)
    return softmax_ce_loss(pred_logits, onehot, weight)


def score_weight(mask, positive_weight, negative_weight):
    """Per-cell score weighting (reference _score_weight, car/YOLO.py:482-489)."""
    return jnp.where(mask > 0, positive_weight, negative_weight)
