#!/bin/bash
# Round-4 TPU queue (session 14): chip work that must NOT run
# concurrently with tpu_session13.sh (one chip serializes jobs and
# inflates timings) — so first WAIT for session13 to finish, then:
#   A) native node verification (packed single-output export, depth-4
#      dispatch pipeline) — VERDICT r3 #4's >=500 FPS batch-8 target
#   B) native node bf16 packed timing run
#   C) per-stage profile + MFU at the matmul default — VERDICT r3 #6
#   D) batch sweep 96/128 at the new rectification balance
#   E) multi-object operating-point sweep (nms-iou x score-thresh) on
#      the newest car weights — VERDICT r3 #7
#   F) final headline bench + manifest
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# ---- wait for session13 (marker in its log, or its shell gone) --------
S13_LOG=reports/logs/session13.log
for i in $(seq 1 720); do
    grep -q "tpu_session13 done" "$S13_LOG" 2>/dev/null && break
    # session13's bash is our ancestor-less sibling; if no shell is
    # running the script anymore, it crashed/finished without marker
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session13.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session14] session13 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session14] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session14] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

JOINT=trained/carlp_v2
[ -d trained/carlp_v3 ] && JOINT=trained/carlp_v3
CARV=car_v2
[ -d trained/car_v3 ] && CARV=car_v3

# ---- phase A: native node, packed + u8 + depth-4, f32 verification ----
ensure_chip
$RS --name pjrt_node_packed --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT" --ocr-weights trained/ocr_v2 \
        --u8 --packed --depth 4 --batch 8 --batches 12 \
        --out reports/pjrt_node_demo.json
commit_now "Native node: packed serving export + depth-4 pipeline, verified on chip"

# ---- phase B: native node bf16 packed timing ---------------------------
ensure_chip
$RS --name pjrt_node_bf16 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_bf16.json -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT" --ocr-weights trained/ocr_v2 \
        --u8 --packed --bf16 --depth 4 --batch 8 --batches 12 \
        --out reports/pjrt_node_bf16.json
commit_now "Native node bf16 packed timing run"

# ---- phase C: per-stage profile + MFU at the matmul default ------------
ensure_chip
$RS --name profile_r4 --timeout 2400 --allow-fail \
    --artifact reports/profile_pipeline.json -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json
commit_now "Round-4 per-stage profile (matmul rectification default)"

# ---- phase D: batch sweep at the new balance ----------------------------
ensure_chip
YOLO_TPU_BENCH_BATCH=96 $RS --name bench_b96 --timeout 900 --allow-fail \
    --artifact reports/bench_b96.json --last-line -- python bench.py
ensure_chip
YOLO_TPU_BENCH_BATCH=128 $RS --name bench_b128 --timeout 900 --allow-fail \
    --artifact reports/bench_b128.json --last-line -- python bench.py
commit_now "Round-4 batch sweep (96/128) with matmul rectification"

# ---- phase E: multi-object operating-point sweep ------------------------
for nms in 0.3 0.45 0.6; do
    for st in 0.3 0.5; do
        ensure_chip
        $RS --name "mo_${nms}_${st}" --timeout 1200 --allow-fail \
            --artifact "reports/eval_mo_${CARV}_n${nms}_s${st}.json" \
            --last-line -- \
            python -m yolo_tpu.apps.car "runs/${CARV}" eval \
                --topk 8 --num-obj 3 \
                --nms-iou "$nms" --score-thresh "$st"
    done
done
commit_now "Multi-object operating-point sweep (nms-iou x score-thresh, 3 cars/scene)"

# ---- phase F: final headline bench + manifest ---------------------------
ensure_chip
$RS --name bench_final_r4 --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/pjrt_node_demo.json reports/pjrt_node_bf16.json \
    reports/profile_pipeline.json reports/bench_b96.json \
    reports/bench_b128.json reports/bench_final.json || true
commit_now "session14 queue complete: final bench + manifest"
echo "=== tpu_session14 done ==="
