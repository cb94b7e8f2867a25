#!/bin/bash
# Round-4 TPU queue (session 18): native-node eager-d2h verification.
# The round-3/4 node runs were d2h-bound at ~86 ms/batch: the shim only
# STARTED each readback at harvest time, so every batch paid one full
# transport round-trip serially (reports/pjrt_node_demo.json,
# steady_d2h_ms 85.9 of 91.9). The shim now enqueues the ToHost copy at
# dispatch (native/pjrt_shim.cpp start_d2h), letting depth-D readbacks
# ride the transport concurrently; the demo also gained a same-backend
# (TPU-vs-TPU) reference worker so the verification gate is tight
# (plate_match >= 0.98 f32) instead of measuring CPU-vs-MXU numerics.
# Waits for tpu_session17.sh (one chip serializes jobs), then:
#   A) f32 packed u8 node demo, depth 8  -> reports/pjrt_node_demo.json
#   B) bf16 packed timing run, depth 8   -> reports/pjrt_node_bf16.json
#   C) depth sweep point (depth 16, f32) -> reports/pjrt_node_depth16.json
#   D) final headline bench + manifest
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

S17_LOG=reports/logs/session17.log
for i in $(seq 1 720); do
    grep -q "tpu_session17 done" "$S17_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session17.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session18] session17 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session18] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session18] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs native/*.so native/pjrt_node 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

JOINT=trained/carlp_v2
[ -d trained/carlp_v3 ] && JOINT=trained/carlp_v3
[ -d trained/carlp_v4 ] && JOINT=trained/carlp_v4
OCRW=trained/ocr_v2
[ -d trained/ocr_v3 ] && OCRW=trained/ocr_v3

# ---- phase A: f32 packed node demo, eager d2h, depth 8 -----------------
ensure_chip
$RS --name pjrt_node_eager_f32 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT" --ocr-weights "$OCRW" \
        --u8 --packed --depth 8 --batch 8 --batches 16 \
        --out reports/pjrt_node_demo.json
commit_now "Native node: eager-d2h pipelined readback + same-backend verify (f32)"

# ---- phase B: bf16 packed timing run, depth 8 ---------------------------
ensure_chip
$RS --name pjrt_node_eager_bf16 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_bf16.json -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT" --ocr-weights "$OCRW" \
        --u8 --packed --bf16 --depth 8 --batch 8 --batches 16 \
        --out reports/pjrt_node_bf16.json
commit_now "Native node bf16 eager-d2h timing run"

# ---- phase C: depth-16 sweep point (does deeper pipelining still pay?) --
ensure_chip
$RS --name pjrt_node_depth16 --timeout 3600 --allow-fail \
    --artifact reports/pjrt_node_depth16.json -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT" --ocr-weights "$OCRW" \
        --u8 --packed --depth 16 --batch 8 --batches 24 \
        --out reports/pjrt_node_depth16.json
commit_now "Native node depth-16 sweep point"

# ---- phase D: final headline bench + manifest ---------------------------
ensure_chip
$RS --name bench_final_r4c --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/pjrt_node_demo.json reports/pjrt_node_bf16.json \
    reports/pjrt_node_depth16.json reports/bench_final.json || true
commit_now "session18 queue complete: native-node eager-d2h evidence + final bench"
echo "=== tpu_session18 done ==="
