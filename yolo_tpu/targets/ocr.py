"""Vectorised per-column OCR targets.

Semantics of the reference's ``loss_mask`` (OCR/OCR.py:77-100): every
output column whose index falls inside a character's [left, right) span
(rounded to column units) gets soft score
``1 - |column_centre - char_centre| / char_width`` and that character's
class id; columns covered by no character get score 0 / class -1.

Where two characters claim a column (the reference resolved this by
processing a shuffled order, last writer winning) the higher-scoring
character wins — deterministic and equivalent in distribution for
non-degenerate plates.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class OCRTargets(NamedTuple):
    score: jnp.ndarray   # (B, 1, area, 1) soft scores
    cls: jnp.ndarray     # (B, 1, area) int32, -1 where empty


def assign_ocr_targets(labels, area: int = 24) -> OCRTargets:
    """labels: (B, chars, 3) = [cls, left, right] normalised; cls < 0 pads."""
    cls = labels[..., 0]                       # (B, O)
    left = labels[..., 1]
    right = labels[..., 2]
    valid = cls >= 0

    cols = jnp.arange(area, dtype=jnp.float32)          # (A,)
    # py2 round() == floor(x + 0.5) for the positive spans used here
    li = jnp.floor(left * area + 0.5)                    # (B, O)
    ri = jnp.floor(right * area + 0.5)
    in_span = ((cols[None, None, :] >= li[..., None]) &
               (cols[None, None, :] < ri[..., None]) &
               valid[..., None])                         # (B, O, A)

    centre = (left + right) / 2.0
    width = right - left
    box_cent = (cols + 0.5) / float(area)
    score = 1.0 - jnp.abs(box_cent[None, None, :] - centre[..., None]) / \
        jnp.maximum(width[..., None], 1e-6)
    # clamp at 0: a rounded span can include a column whose centre is
    # more than one char-width out for very narrow chars, and a negative
    # value would flow into the score target AND the class-loss sample
    # weight (negative loss rewards wrong predictions)
    score = jnp.where(in_span, jnp.maximum(score, 0.0), 0.0)  # (B, O, A)

    best = jnp.argmax(score, axis=1)                     # (B, A)
    col_score = jnp.max(score, axis=1)                   # (B, A)
    col_cls = jnp.take_along_axis(
        cls, best, axis=1).astype(jnp.int32)             # (B, A)
    col_cls = jnp.where(col_score > 0, col_cls, -1)

    return OCRTargets(
        score=col_score[:, None, :, None],
        cls=col_cls[:, None, :],
    )
