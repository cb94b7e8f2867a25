# Convenience targets (see README.md for the full CLI surface)

.PHONY: test bench native train-ocr train-lpd train-car clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

train-ocr:
	python -m yolo_tpu.apps.ocr ocr_v1 train --steps 4000

train-lpd:
	python -m yolo_tpu.apps.lp_detection lp_v2 train --steps 20000

train-car:
	python -m yolo_tpu.apps.car car_v1 train --steps 20000

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
