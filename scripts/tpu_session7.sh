#!/bin/bash
# Round-3 TPU queue (session 7): joint-model anchor refit.
#
# carlp_v2's anchors ([0.31..1.06] h/w) fit the 3-D sprite distribution
# even worse than car_v2's did (refit mean best-IoU 0.828 vs 0.707) —
# carlp_v3 fine-tunes the freshly trained carlp_v2 with the refit
# anchors, then records the joint eval and a final headline bench.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# 0. wait for session 6 (pid file) to finish
if [ -f /tmp/session6.pid ]; then
    while kill -0 "$(cat /tmp/session6.pid)" 2>/dev/null; do sleep 30; done
fi

# 1. carlp_v3 fine-tune from carlp_v2 with refit anchors
JOINT_W=$([ -d trained/carlp_v2 ] && echo trained/carlp_v2 || echo trained/carlp_v1)
$RS --name carlp_v3_train --timeout 10800 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 train \
            --until-step 12000 --bf16 1 --weight "$JOINT_W"
$RS --name pkg_carlp_v3 --timeout 2400 -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v3/backup \
        --dst trained/carlp_v3 --force
$RS --name carlp_v3_eval --timeout 1500 \
    --artifact reports/eval_carlp_v3.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 eval

# 2. final headline bench (picks up trained/carlp_v3 if bench prefers it;
#    provenance line goes to stderr/log)
$RS --name bench_final_r3 --timeout 900 \
    --artifact reports/bench_final.json --last-line -- \
    python bench.py

python scripts/manifest.py \
    reports/eval_carlp_v3.json reports/bench_final.json

echo "=== tpu_session7 done ==="
