from yolo_tpu.render.fonts import GlyphAtlas, build_glyph_atlas  # noqa: F401
from yolo_tpu.render.lp import LPRenderer  # noqa: F401
from yolo_tpu.render.backgrounds import (  # noqa: F401
    BackgroundPool, procedural_backgrounds)
from yolo_tpu.render.car import (  # noqa: F401
    CarAssetPool, CarRenderer, procedural_car_assets)
