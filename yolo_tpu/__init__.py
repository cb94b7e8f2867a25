"""yolo_tpu — a TPU-native (JAX/XLA/Pallas) ALPR + vehicle-orientation framework.

A ground-up rebuild of the capabilities of the n8886919/YOLO research stack
(MXNet/Gluon, reference mounted at /root/reference) as an idiomatic JAX
framework:

* pure-functional model definitions (flax.linen) — YOLOv3 pyramid nets,
  DenseNet detectors, the joint car+licence-plate network
  (reference: yolo_modules/basic_yolo.py, licence_plate/LP_detection.py:59-97,
  car/utils.py:48-95, car_and_LP/YOLO.py:47-95)
* vectorised target assignment and losses (reference's per-object python
  loops in car/YOLO.py:401-480, LP_detection.py:259-313, OCR/OCR.py:77-100)
* on-device synthetic data rendering — licence-plate composition with a
  6-DoF perspective camera model and car compositing
  (reference: yolo_modules/licence_plate_render/__init__.py, car/render_car.py)
* a fused on-device inference cascade: detector -> decode -> perspective
  unwarp -> OCR, with no host round-trips (replaces the ROS-topic hops
  between LPD_video_node.py, carLP_video_node.py and OCR/OCR.py)
* data-parallel scale-out via jax.sharding over a device Mesh (replaces
  yolo_modules/yolo_gluon.py:100-124 manual GPU splitting + kvstore)

Everything here is new code designed for TPU execution: NHWC layouts,
static shapes, bf16-on-MXU friendly blocks, lax control flow.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: a single session runs the same
# programs from many processes (train watchdog relaunches, eval tools,
# bench), and first-compile on the chip is 20 s-minutes each. Opt out
# with YOLO_TPU_NO_COMPILE_CACHE=1; override dir with JAX_COMPILATION_CACHE_DIR
# (stock JAX env var, respected by jax itself when set).
if not _os.environ.get("YOLO_TPU_NO_COMPILE_CACHE") and not _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR"
):
    try:  # pragma: no cover - environment-dependent
        import jax as _jax

        _cache = _os.path.expanduser("~/.cache/yolo_tpu_xla")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as _e:  # pragma: no cover - environment-dependent
        # A disabled cache means every fresh process repays minutes of
        # compile — make that visible in session logs instead of silent.
        import warnings as _warnings

        _warnings.warn(f"yolo_tpu: persistent XLA compile cache disabled "
                       f"({_e!r})", stacklevel=1)

from yolo_tpu.config import Spec, load_spec  # noqa: F401
