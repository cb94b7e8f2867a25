#!/bin/bash
# Round-3 TPU queue (session 10): runs AFTER session 9 drains. Payoff leg
# for the cascade label-geometry fix (render_cascade span remapping):
# retrain OCR on correctly-aligned cascade targets, then re-measure the
# full cascade with the best available LPD.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session10] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 240
    done
    echo "[session10] chip UP $(date -u +%FT%TZ)"
}

# wait for session 9's queue to finish (never run two TPU jobs at once)
if [ -f /tmp/session9.pid ]; then
    while kill -0 "$(cat /tmp/session9.pid)" 2>/dev/null; do
        echo "[session10] waiting for session9 $(date -u +%FT%TZ)"
        sleep 300
    done
fi

# ---- ocr_v3: cascade-matched training on FIXED label geometry --------
ensure_chip
$RS --name ocr_v3_train --timeout 7200 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/ocr_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.ocr runs/ocr_v3 train \
            --steps 6000 --bf16 1 --weight trained/ocr_v2
$RS --name pkg_ocr_v3 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/ocr_v3/backup \
        --dst trained/ocr_v3 --force

# ---- cascade re-measure: best LPD x {ocr_v2, ocr_v3} A/B -------------
LP=trained/lp_v3; [ -d "$LP" ] || LP=trained/lp_v2
ensure_chip
$RS --name cascade_ocr3_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_ocr3.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp "$LP" --ocr trained/ocr_v3 \
        --batches 8 --with-lpd --out reports/eval_cascade_ocr3.json
ensure_chip
$RS --name cascade_ocr2_ctrl --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_ocr2_ctrl.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp "$LP" --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --out reports/eval_cascade_ocr2_ctrl.json

python scripts/manifest.py \
    reports/eval_cascade_ocr3.json reports/eval_cascade_ocr2_ctrl.json

echo "=== tpu_session10 done ==="
