#!/bin/bash
# Round-4 TPU queue (session 13): the three training legs prepared in
# round 3 that the outage stranded (VERDICT r3 #2/#5/#7), plus the
# real-image transfer eval (VERDICT r3 #3, "missing" #1). Ordered by
# VERDICT priority so a round-end cut loses the least important leg.
# Every phase ends with an auto-commit (VERDICT r3 #9: an outage must
# never strand evidence again).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session13] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session13] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- phase A: real-image transfer (bundled reference photo) -----------
ensure_chip
$RS --name real_image --timeout 3000 --allow-fail \
    --artifact reports/real_image.json --check -- \
    python -m yolo_tpu.tools.real_image \
        --lp trained/lp_v2 --ocr trained/ocr_v2 \
        --out reports/real_image.json --save-dir reports/real_image
commit_now "Real-image transfer eval: trained cascade on the bundled reference plate photo"

# ---- phase B: carlp_v3 (joint anchor refit, bf16; VERDICT #2) ----------
ensure_chip
$RS --name carlp_v3_train --timeout 12600 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 train \
            --until-step 12000 --bf16 1 --weight trained/carlp_v2
$RS --name pkg_carlp_v3 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v3/backup \
        --dst trained/carlp_v3 --force
ensure_chip
$RS --name carlp_v3_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_carlp_v3.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 eval
commit_now "carlp_v3 joint leg: anchor-refit bf16 fine-tune from carlp_v2 + eval"

# ---- phase C: lp_v3 (corner IoU >=0.90 -> cascade >=95%; VERDICT #5) ---
ensure_chip
$RS --name lp_v3_train --timeout 12600 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/lp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.lp_detection runs/lp_v3 train \
            --until-step 12000 --bf16 1 --weight trained/lp_v2
$RS --name pkg_lp_v3 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/lp_v3/backup \
        --dst trained/lp_v3 --force
ensure_chip
$RS --name cascade_v3_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_v3.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v3 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --out reports/eval_cascade_v3.json
commit_now "lp_v3 convergence leg + fused-cascade re-eval"

# ---- phase D: headline bench with the newest weights -------------------
ensure_chip
$RS --name bench_final_r4 --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- \
    python bench.py
commit_now "Round-4 mid-queue bench"

# ---- phase E: car_v3 (anchor refit; multi-object; VERDICT #7) ----------
ensure_chip
$RS --name car_v3_train --timeout 12600 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/car_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car runs/car_v3 train \
            --until-step 12000 --bf16 1 --weight trained/car_v2
$RS --name pkg_car_v3 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/car_v3/backup \
        --dst trained/car_v3 --force
ensure_chip
$RS --name car_v3_eval --timeout 1200 --allow-fail \
    --artifact reports/eval_car_v3.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval
ensure_chip
$RS --name car_v3_eval_multi --timeout 1200 --allow-fail \
    --artifact reports/eval_car_v3_multi.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval --topk 8
commit_now "car_v3 anchor-refit leg + single/multi-object evals"

python scripts/manifest.py \
    reports/real_image.json reports/eval_carlp_v3.json \
    reports/eval_cascade_v3.json reports/bench_final.json \
    reports/eval_car_v3.json reports/eval_car_v3_multi.json || true
commit_now "session13 queue complete: manifest"
echo "=== tpu_session13 done ==="
