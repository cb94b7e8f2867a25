#!/bin/bash
# Round-3 TPU queue (session 6): accuracy pushes that the session-4/5
# evidence motivated, cheapest-first.
#
#  A. bench batch sweep (32/96/128 vs the recorded 64 default) — pick the
#     throughput-optimal serving batch with data
#  B. car_v3: fine-tune car_v2 with anchors REFIT to the 3-D sprite
#     distribution (iou_kmeans: mean best-IoU 0.83 refit vs 0.71 with the
#     reference anchors — the v2 box IoU 0.79 plateau is anchor-limited)
#  C. lp_v3: LPD cosine leg 3 (corner IoU 0.872 -> target >=0.90) and the
#     cascade re-eval (target >=95% exact, VERDICT #8)
#
# Every step goes through scripts/run_step.py (fail-loud; empty/invalid
# JSON is a step failure). Ends with a manifest.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# 0. wait for session 5 (pid file) to finish
if [ -f /tmp/session5.pid ]; then
    while kill -0 "$(cat /tmp/session5.pid)" 2>/dev/null; do sleep 30; done
fi

# A. bench batch sweep (the 64-batch number is already recorded)
for B in 32 96 128; do
    YOLO_TPU_BENCH_BATCH=$B $RS --name bench_b$B --timeout 900 --allow-fail \
        --artifact reports/bench_b$B.json --last-line -- \
        python bench.py
done

# B. car_v3 fine-tune with refit anchors (from trained/car_v2)
$RS --name car_v3_train --timeout 10800 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/car_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car runs/car_v3 train \
            --until-step 12000 --bf16 1 --weight trained/car_v2
$RS --name pkg_car_v3 --timeout 2400 -- \
    python -m yolo_tpu.tools.package_weights --src runs/car_v3/backup \
        --dst trained/car_v3 --force
$RS --name car_v3_eval --timeout 1200 \
    --artifact reports/eval_car_v3.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval
$RS --name car_v3_eval_multi --timeout 1200 \
    --artifact reports/eval_car_v3_multi.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval --topk 8

# C. LPD leg 3 + cascade re-eval
$RS --name lp_v3_train --timeout 7200 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/lp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.lp_detection runs/lp_v3 train \
            --until-step 12000 --bf16 1 --weight trained/lp_v2
$RS --name pkg_lp_v3 --timeout 1200 -- \
    python -m yolo_tpu.tools.package_weights --src runs/lp_v3/backup \
        --dst trained/lp_v3 --force
$RS --name cascade_v3_eval --timeout 1500 \
    --artifact reports/eval_cascade_v3.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v3 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --out reports/eval_cascade_v3.json

python scripts/manifest.py \
    reports/bench_b32.json reports/bench_b96.json reports/bench_b128.json \
    reports/eval_car_v3.json reports/eval_car_v3_multi.json \
    reports/eval_cascade_v3.json

echo "=== tpu_session6 done ==="
