#!/bin/bash
# Round-4 TPU queue (session 15, v3): closes the round's accuracy goals.
# Waits for tpu_session14.sh (one chip serializes jobs), then — ordered
# so a round-end cut loses the least (cheap evidence refreshes land
# before the long joint leg):
#   A) ocr_v3 retrain. Round 3 FIXED the cascade OCR label geometry
#      (ffc375d: noisy-pose crops labeled through the true-pose
#      homography) and queued this retrain, but the outage ate it —
#      trained/ocr_v2 still predates the fix, so half of every cascade
#      batch it saw had chance-level column targets. Retraining on the
#      fixed targets is the main remaining lever for cascade >=95%.
#   B) fused-cascade re-eval with lp_v3 x ocr_v3
#   C) real-image transfer eval refreshed on lp_v3 + ocr_v3
#   D) carlp_v4 LP-boosted fine-tune (6k) from carlp_v3
#   E) carlp_v4 joint eval + fused-cascade-on-the-joint-net eval
#   F) final headline bench + manifest
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# ---- wait for session14 (marker in its log, or its shell gone) --------
S14_LOG=reports/logs/session14.log
for i in $(seq 1 720); do
    grep -q "tpu_session14 done" "$S14_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session14.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session15] session14 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session15] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session15] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- phase A: ocr_v3 retrain on the fixed cascade label geometry ------
ensure_chip
$RS --name ocr_v3_train --timeout 7200 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/ocr_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.ocr runs/ocr_v3 train \
            --until-step 6000 --bf16 1 --weight trained/ocr_v2
$RS --name pkg_ocr_v3 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/ocr_v3/backup \
        --dst trained/ocr_v3 --force
commit_now "ocr_v3: retrain on the fixed cascade label geometry (lost to the r3 outage)"

# ---- phase B: fused cascade on lp_v3 x ocr_v3 ---------------------------
ensure_chip
$RS --name cascade_v3_ocr3 --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_v3_ocr3.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v3 --ocr trained/ocr_v3 \
        --batches 8 --out reports/eval_cascade_v3_ocr3.json
commit_now "Fused-cascade re-eval: lp_v3 x ocr_v3 (post-label-fix OCR)"

# ---- phase C: real-image transfer refreshed on the v3 legs --------------
ensure_chip
$RS --name real_image_v3 --timeout 3000 --allow-fail \
    --artifact reports/real_image_v3.json --check -- \
    python -m yolo_tpu.tools.real_image \
        --lp trained/lp_v3 --ocr trained/ocr_v3 \
        --out reports/real_image_v3.json --save-dir reports/real_image_v3
commit_now "Real-image transfer eval refreshed on lp_v3 + ocr_v3"

# ---- phase D: carlp_v4 LP-boosted fine-tune (6k) ------------------------
ensure_chip
$RS --name carlp_v4_train --timeout 8400 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v4/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 train \
            --until-step 6000 --bf16 1 --weight trained/carlp_v3
$RS --name pkg_carlp_v4 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v4/backup \
        --dst trained/carlp_v4 --force
commit_now "carlp_v4 joint leg: LP-signal-boosted bf16 fine-tune from carlp_v3"

# ---- phase E: joint eval + fused-cascade-on-the-joint-net eval ----------
ensure_chip
$RS --name carlp_v4_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_carlp_v4.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 eval
ensure_chip
$RS --name carlp_v4_cascade --timeout 2400 --allow-fail \
    --artifact reports/eval_carlp_v4_cascade.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 eval --cascade 1
commit_now "carlp_v4 evals: joint pose + fused cascade on the joint net"

# ---- phase F: final headline bench + manifest ---------------------------
ensure_chip
$RS --name bench_final_r4b --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/eval_cascade_v3_ocr3.json reports/real_image_v3.json \
    reports/eval_carlp_v4.json reports/eval_carlp_v4_cascade.json \
    reports/bench_final.json || true
commit_now "session15 queue: v3/v4 accuracy legs + final bench + manifest"
echo "=== tpu_session15 done ==="
