"""Task applications — the user-facing layer of the framework.

One module per reference project, same CLI shape (``<version> <mode>``
with spec.yaml-per-version configs):

* ``apps.lp_detection``  — licence-plate 6-DoF pose detector
  (reference licence_plate/LP_detection.py)
* ``apps.car``           — vehicle orientation YOLOv3 / DenseNet
  (reference car/YOLO.py)
* ``apps.car_and_lp``    — joint car + plate network
  (reference car_and_LP/YOLO.py)
* ``apps.ocr``           — plate character recognition (reference OCR/OCR.py)

Run e.g.::

    python -m yolo_tpu.apps.car v1 train --steps 10000
    python -m yolo_tpu.apps.lp_detection v2 valid
    python -m yolo_tpu.apps.car_and_lp v1 export
    python -m yolo_tpu.apps.ocr v1 video --dev video.mp4
"""
