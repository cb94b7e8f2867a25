#!/bin/bash
# Final round-2 TPU queue: joint (carlp) training, kernel/profile reruns
# with the Mosaic fixes, final evals, weight packaging, headline bench.
set -x
cd /root/repo
mkdir -p reports trained

# 1. joint car+LP training leg (watchdogged)
python scripts/watchdog_train.py --metrics runs/carlp_v1/logs/metrics.jsonl \
    --stale 420 --grace 1200 -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v1 train --until-step 7500 --bf16 1

# 1b. rerun the regression-arm A/B eval (timed out in session 2)
timeout 900 python -m yolo_tpu.apps.ocr runs/ocr_ab_reg eval \
    2>/tmp/ab_reg_eval.err | tail -1 > reports/ocr_ab_regression.json

# 2. kernel/profile reruns (fixed tools)
timeout 1800 python -m yolo_tpu.tools.profile_pipeline \
    --out reports/profile_pipeline.json --trace /tmp/pipeline_trace
timeout 1500 python -m yolo_tpu.tools.bench_conv_kernel \
    --out reports/bench_conv_kernel.json
timeout 900 python -m yolo_tpu.tools.pjrt_node_demo \
    --out reports/pjrt_node_demo.json

# 3. package weights
python -m yolo_tpu.tools.package_weights --src runs/lp_v2/backup \
    --dst trained/lp_v2 --force
python -m yolo_tpu.tools.package_weights --src runs/ocr_v2/backup \
    --dst trained/ocr_v2 --force
python -m yolo_tpu.tools.package_weights --src runs/car_v1/backup \
    --dst trained/car_v1 --force
python -m yolo_tpu.tools.package_weights --src runs/carlp_v1/backup \
    --dst trained/carlp_v1 --force

# 4. final evals with packaged weights
timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp trained/lp_v2 --ocr trained/ocr_v2 \
    --batches 8 --with-lpd --out reports/eval_final_cascade.json
timeout 900 python -m yolo_tpu.apps.car runs/car_v1 eval 2>/dev/null \
    | tail -1 > reports/eval_car_final.json
timeout 1200 python -m yolo_tpu.apps.car_and_lp runs/carlp_v1 eval \
    2>/dev/null | tail -1 > reports/eval_carlp_final.json

# 5. headline bench with trained weights
timeout 560 python bench.py | tail -1 > reports/bench_final.json

echo "=== tpu_session3 done ==="
