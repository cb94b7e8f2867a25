#!/bin/bash
# Round-4 TPU queue (session 21): corner-reprojection legs + clean
# timing re-runs. The 18:30-19:30 window had sessions 15/18/19 on the
# chip AT ONCE (stale done-markers defeated the log gates), so every
# timing artifact from that window is contention-inflated; this session
# gates on PROCESS ABSENCE of all prior session shells instead, then:
#   A) lp_v5: corner-reprojection fine-tune from lp_v3 (the binding
#      constraint on cascade exact-match is lpd corner IoU ~0.88;
#      runs/lp_v5/spec.yaml) + high-n cascade re-eval vs ocr_v3
#   B) carlp_v5: the same corner term on the joint net from carlp_v4
#      (joint LP corner 0.768 / Z 171mm vs 0.871 / 43mm solo) + evals
#   C) clean pjrt node timing re-runs (batch 8 + batch 64: steady state
#      is d2h-RTT-bound at ~86ms/readback, so FPS should scale ~linearly
#      in batch — the serving-throughput claim needs the big-batch point)
#   D) final headline bench + manifest, solo on the chip
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# ---- wait until NO prior session shell is alive ------------------------
# (log markers go stale across re-runs of the same script; process
# absence is the only reliable all-drained signal)
for i in $(seq 1 720); do
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | \
                grep -qE "tpu_session(15|17|18|19|20)\.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session21] all prior sessions drained $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session21] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session21] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- phase A: lp_v5 corner-reprojection leg ----------------------------
ensure_chip
$RS --name lp_v5_train --timeout 5400 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/lp_v5/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.lp_detection runs/lp_v5 train \
            --until-step 6000 --bf16 1 --weight trained/lp_v3
$RS --name pkg_lp_v5 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/lp_v5/backup \
        --dst trained/lp_v5 --force
commit_now "lp_v5: corner-reprojection fine-tune from lp_v3"

OCRW=trained/ocr_v2
[ -d trained/ocr_v3 ] && OCRW=trained/ocr_v3
ensure_chip
$RS --name cascade_lp_v5 --timeout 2400 --allow-fail \
    --artifact reports/eval_cascade_lp_v5.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v5 --ocr "$OCRW" \
        --batches 16 --out reports/eval_cascade_lp_v5.json
ensure_chip
$RS --name real_image_v5 --timeout 3000 --allow-fail \
    --artifact reports/real_image_v5.json --check -- \
    python -m yolo_tpu.tools.real_image \
        --lp trained/lp_v5 --ocr "$OCRW" \
        --out reports/real_image_v5.json --save-dir reports/real_image_v5
commit_now "lp_v5 high-n cascade + real-image evals (corner-loss leg)"

# ---- phase B: carlp_v5 joint corner leg --------------------------------
ensure_chip
$RS --name carlp_v5_train --timeout 8400 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v5/logs/metrics.jsonl --stale 420 \
        --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v5 train \
            --until-step 6000 --bf16 1 --weight trained/carlp_v4
$RS --name pkg_carlp_v5 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v5/backup \
        --dst trained/carlp_v5 --force
commit_now "carlp_v5: joint corner-reprojection fine-tune from carlp_v4"

ensure_chip
$RS --name carlp_v5_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_carlp_v5.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v5 eval
ensure_chip
$RS --name carlp_v5_cascade --timeout 2400 --allow-fail \
    --artifact reports/eval_carlp_v5_cascade.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v5 eval --cascade 1
commit_now "carlp_v5 joint + fused-cascade-on-the-joint-net evals"

# ---- phase C: clean pjrt node timing (no chip contention now) ----------
ensure_chip
$RS --name pjrt_node_clean_b8 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v4 --ocr-weights trained/ocr_v3 \
        --u8 --packed --depth 8 --batch 8 --batches 16 \
        --out reports/pjrt_node_demo.json
ensure_chip
$RS --name pjrt_node_clean_b64 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_b64.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v4 --ocr-weights trained/ocr_v3 \
        --u8 --packed --depth 8 --batch 64 --batches 16 \
        --out reports/pjrt_node_b64.json
commit_now "Clean (solo-chip) pjrt node timings at batch 8 and 64"

# ---- phase D: final headline bench + manifest --------------------------
ensure_chip
$RS --name bench_final_r4f --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/eval_cascade_lp_v5.json reports/eval_carlp_v5.json \
    reports/eval_carlp_v5_cascade.json reports/pjrt_node_demo.json \
    reports/pjrt_node_b64.json reports/bench_final.json \
    2>/dev/null || true
commit_now "session21 queue complete: corner legs + clean timings + bench"
echo "=== tpu_session21 done ==="
