"""Glyph atlas for synthetic licence plates.

The reference ships 35 pre-rasterised font PNGs
(yolo_modules/licence_plate_render/fonts/, loaded at
licence_plate_render/__init__.py:34-43). We rasterise the same glyph set
at import time from a system TrueType font instead: indices 0-9 are the
digits, 10-33 the letters A-Z excluding I and O (the Taiwanese plate
alphabet, OCR/OCR.py:29-30,220-224), and a separate dash/dot glyph.

The atlas is a (34, GLYPH_H, GLYPH_W) float array of ink alpha in [0, 1],
shaped for on-device gather-and-composite plate drawing.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

GLYPH_H, GLYPH_W = 90, 45      # slot size on the 380x160 plate canvas
DOT_H, DOT_W = 70, 10

CLASS_NAMES = ['0', '1', '2', '3', '4', '5', '6', '7', '8', '9',
               'A', 'B', 'C', 'D', 'E', 'F', 'G', 'H',
               'J', 'K', 'L', 'M', 'N', 'P', 'Q', 'R',
               'S', 'T', 'U', 'V', 'W', 'X', 'Y', 'Z']

_FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/liberation/LiberationMono-Bold.ttf",
]


class GlyphAtlas(NamedTuple):
    glyphs: np.ndarray    # (34, GLYPH_H, GLYPH_W) ink alpha
    dot: np.ndarray       # (DOT_H, DOT_W) ink alpha


def _render_glyph_pil(ch: str, h: int, w: int) -> np.ndarray:
    from PIL import Image, ImageDraw, ImageFont
    font_path = next((p for p in _FONT_CANDIDATES if os.path.exists(p)), None)
    canvas = Image.new("L", (w * 2, h * 2), 0)
    draw = ImageDraw.Draw(canvas)
    if font_path is not None:
        font = ImageFont.truetype(font_path, int(h * 1.6))
    else:       # last-resort PIL bitmap font
        font = ImageFont.load_default()
    draw.text((w // 4, 0), ch, fill=255, font=font)
    arr = np.asarray(canvas, np.float32) / 255.0
    ys, xs = np.nonzero(arr > 0.1)
    if len(ys):   # tight-crop then resize into the slot
        arr = arr[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    img = Image.fromarray((arr * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def _procedural_glyph(idx: int, h: int, w: int) -> np.ndarray:
    """Deterministic fallback 'glyph' (distinct bar pattern per class) so the
    renderer works even without PIL/fonts — classes stay separable."""
    g = np.zeros((h, w), np.float32)
    bits = [(idx >> k) & 1 for k in range(6)]
    band = h // 7
    for k, b in enumerate(bits):
        if b:
            g[k * band:(k + 1) * band, 2:w - 2] = 1.0
    g[6 * band:, 2:w - 2] = 0.5
    return g


def build_glyph_atlas(h: int = GLYPH_H, w: int = GLYPH_W) -> GlyphAtlas:
    glyphs = np.zeros((len(CLASS_NAMES), h, w), np.float32)
    try:
        for i, ch in enumerate(CLASS_NAMES):
            glyphs[i] = _render_glyph_pil(ch, h, w)
        dot = np.zeros((DOT_H, DOT_W), np.float32)
        dot[28:42, :] = 1.0                      # the plate dash
    except Exception:
        for i in range(len(CLASS_NAMES)):
            glyphs[i] = _procedural_glyph(i, h, w)
        dot = np.ones((DOT_H, DOT_W), np.float32) * 0.8
    return GlyphAtlas(glyphs=glyphs, dot=dot)
