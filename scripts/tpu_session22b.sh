#!/bin/bash
# Round-4 session-22 TAIL (evals only): runs after the in-session lp_v5
# queue drains, packing the rest of this session's wall clock with the
# stranded evals, ordered by marginal evidence value per chip-minute.
# The carlp_v5 TRAINING leg is deliberately NOT here — it does not fit
# this session's remaining wall clock; scripts/tpu_session22.sh (next
# session) trains it first and skips everything this tail completes.
# Every phase is idempotent and auto-commits.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# ---- wait for the lp_v5 queue (exact: its wrapper PID dies last) --------
if [ -f /tmp/lp_v5_queue.pid ]; then
    QPID=$(cat /tmp/lp_v5_queue.pid)
    for i in $(seq 1 120); do
        kill -0 "$QPID" 2>/dev/null || break
        sleep 30
    done
fi
echo "[session22b] lp_v5 queue drained $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session22b] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

OCRW=trained/ocr_v3
LPW=trained/lp_v4
[ -d trained/lp_v5 ] && LPW=trained/lp_v5

# ---- 1: real-image stress on the noise-robust corner LPD ----------------
if [ ! -f reports/real_image_v5.json ]; then
    ensure_chip
    $RS --name real_image_v5 --timeout 2400 --allow-fail \
        --artifact reports/real_image_v5.json --check -- \
        python -m yolo_tpu.tools.real_image --lp "$LPW" --ocr "$OCRW" \
            --out reports/real_image_v5.json --save-dir reports/real_image_v5
    commit_now "Real-image transfer re-eval on $LPW (noise-stress target)"
fi

# ---- 2: 512-plate cascade eval on the best combo -------------------------
if [ ! -f reports/eval_cascade_highn.json ]; then
    ensure_chip
    $RS --name cascade_highn --timeout 2400 --allow-fail \
        --artifact reports/eval_cascade_highn.json --check -- \
        python -m yolo_tpu.tools.cascade_eval --lp "$LPW" --ocr "$OCRW" \
            --batches 16 --out reports/eval_cascade_highn.json
    commit_now "High-n (512-plate) fused-cascade eval on $LPW x ocr_v3"
fi

# ---- 3: car_v4 single-object + density-matched multi-object evals --------
if [ ! -f reports/eval_car_v4.json ]; then
    ensure_chip
    $RS --name car_v4_eval --timeout 1500 --allow-fail \
        --artifact reports/eval_car_v4.json --last-line -- \
        python -m yolo_tpu.apps.car runs/car_v4 eval --weight trained/car_v4
    commit_now "car_v4 single-object eval"
fi
for st in 0.3 0.5; do
    if [ ! -f "reports/eval_car_v4_mo3_s${st}.json" ]; then
        ensure_chip
        $RS --name "car_v4_mo3_s${st}" --timeout 1500 --allow-fail \
            --artifact "reports/eval_car_v4_mo3_s${st}.json" \
            --last-line -- \
            python -m yolo_tpu.apps.car runs/car_v4 eval \
                --weight trained/car_v4 \
                --topk 8 --num-obj 3 --nms-iou 0.45 --score-thresh "$st"
        commit_now "car_v4 multi-object eval (3 cars, score $st)"
    fi
done

# ---- 4: native node batch-64 throughput point -----------------------------
JOINT=trained/carlp_v4
[ -d trained/carlp_v5 ] && JOINT=trained/carlp_v5
if [ ! -f reports/pjrt_node_b64.json ]; then
    ensure_chip
    $RS --name pjrt_node_b64 --timeout 3600 --allow-fail \
        --artifact reports/pjrt_node_b64.json --check -- \
        python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
            --weights "$JOINT" --ocr-weights "$OCRW" \
            --u8 --packed --depth 8 --batch 64 --batches 16 \
            --out reports/pjrt_node_b64.json
    commit_now "Native node batch-64 point: FPS vs the per-harvest d2h floor"
fi

# ---- 5: final headline bench + manifest ------------------------------------
ensure_chip
$RS --name bench_final_r4f --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/eval_cascade_v5.json reports/real_image_v5.json \
    reports/eval_car_v4.json reports/bench_final.json 2>/dev/null || true
commit_now "session22b tail complete: stranded evals + final bench"
echo "=== tpu_session22b done ==="
