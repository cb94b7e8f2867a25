#!/bin/bash
# Round-4 TPU queue (session 17, time-guarded tail): lp_v4 scene-noise
# robustness leg — only if session15 finishes with enough wall-clock
# left (start gate 21:00 UTC; the round-end driver bench must never
# contend with a training job). Waits for tpu_session15.sh.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

S15_LOG=reports/logs/session15.log
for i in $(seq 1 720); do
    grep -q "tpu_session15 done" "$S15_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session15.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session17] session15 finished/absent $(date -u +%FT%TZ)"

# ---- start gate: skip the whole leg when the round is nearly over ------
GATE=$(date -u -d "today 21:00" +%s)
NOW=$(date -u +%s)
if [ "$NOW" -ge "$GATE" ]; then
    echo "[session17] past the 21:00 UTC start gate — skipping lp_v4 leg"
    echo "=== tpu_session17 done (skipped) ==="
    exit 0
fi

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session17] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session17] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- lp_v4: scene-noise robustness fine-tune ---------------------------
ensure_chip
$RS --name lp_v4_train --timeout 5400 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/lp_v4/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.lp_detection runs/lp_v4 train \
            --until-step 8000 --bf16 1 --weight trained/lp_v3
$RS --name pkg_lp_v4 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/lp_v4/backup \
        --dst trained/lp_v4 --force
commit_now "lp_v4: scene-noise robustness fine-tune from lp_v3"

# ---- stress re-eval: did scene-aug training fix the noise collapse? ----
ensure_chip
OCRW=trained/ocr_v2
[ -d trained/ocr_v3 ] && OCRW=trained/ocr_v3
$RS --name real_image_v4 --timeout 3000 --allow-fail \
    --artifact reports/real_image_v4.json --check -- \
    python -m yolo_tpu.tools.real_image \
        --lp trained/lp_v4 --ocr "$OCRW" \
        --out reports/real_image_v4.json --save-dir reports/real_image_v4
ensure_chip
$RS --name cascade_v4 --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_lp_v4.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v4 --ocr "$OCRW" \
        --batches 8 --out reports/eval_cascade_lp_v4.json
commit_now "lp_v4 stress + cascade evals (scene-noise robustness leg)"
echo "=== tpu_session17 done ==="
