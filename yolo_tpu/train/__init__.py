from yolo_tpu.train.tasks import (  # noqa: F401
    CarTask, JointTask, LPTask, OCRTask, TrainState, make_task)
from yolo_tpu.train.trainer import Trainer  # noqa: F401
from yolo_tpu.train.metrics import MetricWriter  # noqa: F401
from yolo_tpu.train.checkpoint import (  # noqa: F401
    latest_checkpoint, restore_checkpoint, save_checkpoint)
