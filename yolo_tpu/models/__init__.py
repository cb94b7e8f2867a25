from yolo_tpu.models.layers import (  # noqa: F401
    ConvBNLeaky, DarknetBlock, DenseBlock, DenseLayer, DenseNetTrunk,
    Transition, YOLODetectionBlock, YOLOOutput, upsample2x)
from yolo_tpu.models.yolov3 import YOLOv3Net, CarLPNet  # noqa: F401
from yolo_tpu.models.densenet import (  # noqa: F401
    LPDenseNet, OCRDenseNet, CarDenseNet)

import jax.numpy as jnp

from yolo_tpu.config import Spec


def build_model(kind: str, spec: Spec, dtype=jnp.float32):
    """Model factory by task kind: 'car', 'car_dense', 'carlp', 'lp', 'ocr'."""
    if kind == "car":
        return YOLOv3Net(spec, dtype=dtype)
    if kind == "carlp":
        return CarLPNet(spec, dtype=dtype)
    if kind == "car_dense":
        return CarDenseNet(spec.num_init_features, spec.growth_rate,
                           spec.block_config,
                           num_anchors=spec.num_anchors_per_cell,
                           channels_per_anchor=spec.slice_point[-1],
                           dtype=dtype)
    if kind == "lp":
        return LPDenseNet(spec.num_init_features, spec.growth_rate,
                          spec.block_config, classes=spec.LP_num_class,
                          dtype=dtype)
    if kind == "ocr":
        return OCRDenseNet(spec.num_init_features, spec.growth_rate,
                           spec.block_config, classes=len(spec.classes),
                           dtype=dtype)
    raise ValueError(f"unknown model kind {kind!r}")
