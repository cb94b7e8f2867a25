from yolo_tpu.targets.car import CarTargetAssigner, CarTargets  # noqa: F401
from yolo_tpu.targets.lp import assign_lp_targets, LPTargets  # noqa: F401
from yolo_tpu.targets.ocr import assign_ocr_targets, OCRTargets  # noqa: F401
