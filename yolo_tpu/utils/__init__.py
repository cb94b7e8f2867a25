from yolo_tpu.utils.colors import ansi, log  # noqa: F401
from yolo_tpu.utils import viz  # noqa: F401
