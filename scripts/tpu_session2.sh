#!/bin/bash
# Remainder of the round-2 TPU queue (after the leg-2 stall recovery):
# profiling reruns, OCR retrain completion under the watchdog, A/B, then
# the car training leg.
set -x
cd /root/repo
mkdir -p reports

# 1. per-stage pipeline profile (weights-as-args fix)
timeout 1500 python -m yolo_tpu.tools.profile_pipeline \
    --out reports/profile_pipeline.json

# 2. fused conv kernel vs XLA
timeout 1500 python -m yolo_tpu.tools.bench_conv_kernel \
    --out reports/bench_conv_kernel.json

# 3. fully native serving node (create-options fix)
timeout 900 python -m yolo_tpu.tools.pjrt_node_demo \
    --out reports/pjrt_node_demo.json

# 4. OCR retrain completion (resumes from runs/ocr_v2/backup)
python scripts/watchdog_train.py --metrics runs/ocr_v2/logs/metrics.jsonl \
    --stale 420 --grace 900 -- \
    python -m yolo_tpu.apps.ocr runs/ocr_v2 train --steps 5000 --bf16 1

timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp runs/lp_v2/backup --ocr runs/ocr_v2/backup \
    --batches 6 --out reports/eval_cascade_ocr_v2.json

# 5. OCR score-loss A/B
python scripts/watchdog_train.py --metrics runs/ocr_ab_log/logs/metrics.jsonl \
    --stale 420 --grace 900 -- \
    python -m yolo_tpu.apps.ocr runs/ocr_ab_log train --steps 1500 --bf16 1
timeout 600 python -m yolo_tpu.apps.ocr runs/ocr_ab_log eval 2>/dev/null \
    | tail -1 > reports/ocr_ab_logistic.json
python scripts/watchdog_train.py --metrics runs/ocr_ab_reg/logs/metrics.jsonl \
    --stale 420 --grace 900 -- \
    python -m yolo_tpu.apps.ocr runs/ocr_ab_reg train --steps 1500 --bf16 1
timeout 600 python -m yolo_tpu.apps.ocr runs/ocr_ab_reg eval 2>/dev/null \
    | tail -1 > reports/ocr_ab_regression.json

# 6. the VOR training leg (the long pole; watchdogged)
python scripts/watchdog_train.py --metrics runs/car_v1/logs/metrics.jsonl \
    --stale 420 --grace 1200 -- \
    python -m yolo_tpu.apps.car runs/car_v1 train --steps 14000 --bf16 1

timeout 900 python -m yolo_tpu.apps.car runs/car_v1 eval 2>/dev/null \
    | tail -1 > reports/eval_car_v1.json

echo "=== tpu_session2 done ==="
