#!/bin/bash
# Round-5 flagship contingency, PRE-EMPTED from session23 phase F into
# the drain queue: eval_carlp_v5.json missed the gates (LP corner IoU
# 0.821 < 0.85, Z MAE 218 > 100 mm), and phase F sits behind ~3h of
# other legs — at the round's wall clock the 8k-step leg only fits if
# it starts right after phase B. Same guards as phase F (which will
# then skip). carlp_v6 = corner scale 0.06 + LP_z repriced 2.0 -> 4.0
# (carlp_v5 traded Z 171 -> 218 mm for corners; see runs/carlp_v6/spec).
set -x
cd /root/repo
RS="python scripts/run_step.py"

NEED_V6=$(python - <<'EOF'
import json
try:
    e = json.load(open("reports/eval_carlp_v5.json"))
    miss = e.get("lp_corner_iou", 0) < 0.85 or e.get("lp_z_mae_mm", 1e9) > 100
    print("1" if miss else "0")
except Exception:
    print("0")
EOF
)
if [ "$NEED_V6" = "1" ] && [ ! -d trained/carlp_v6 ]; then
    $RS --name carlp_v6_train --timeout 7200 --allow-fail -- \
        python scripts/watchdog_train.py \
            --metrics runs/carlp_v6/logs/metrics.jsonl --stale 420 \
            --grace 1800 -- \
            python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 train \
                --until-step 8000 --bf16 1 --weight trained/carlp_v5
    $RS --name pkg_carlp_v6 --timeout 1200 --allow-fail -- \
        python -m yolo_tpu.tools.package_weights --src runs/carlp_v6/backup \
            --dst trained/carlp_v6 --force
    git add -A trained runs reports 2>/dev/null
    git commit -m "carlp_v6: corner 0.06 + LP_z repriced leg from carlp_v5 (8k cosine)" \
        2>&1 | tail -1 || true
fi
if [ -d trained/carlp_v6 ] && [ ! -f reports/eval_carlp_v6.json ]; then
    $RS --name carlp_v6_eval --timeout 2400 --retries 1 --allow-fail \
        --artifact reports/eval_carlp_v6.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6
    git add -A reports 2>/dev/null
    git commit -m "carlp_v6 eval: joint pose (Z-repriced corner leg)" \
        2>&1 | tail -1 || true
fi
if [ -d trained/carlp_v6 ] && [ ! -f reports/eval_carlp_v6_cascade.json ]; then
    $RS --name carlp_v6_cascade --timeout 2400 --retries 1 --allow-fail \
        --artifact reports/eval_carlp_v6_cascade.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6 --cascade 1
    git add -A reports 2>/dev/null
    git commit -m "carlp_v6 eval: fused joint cascade" 2>&1 | tail -1 || true
fi
