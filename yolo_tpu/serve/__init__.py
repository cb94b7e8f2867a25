from yolo_tpu.serve.export import export_model, load_exported  # noqa: F401
from yolo_tpu.serve.video import VideoNode, FrameSource  # noqa: F401
from yolo_tpu.serve.rate import test_inference_rate  # noqa: F401
