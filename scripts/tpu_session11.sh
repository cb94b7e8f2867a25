#!/bin/bash
# Round-3 TPU queue (session 11): post-outage replay of session 9 phase A
# (the chip transport returned 2026-08-19; the session-9 waiter died with
# the VM restart). Cheap missing evidence only — profiler, PJRT roundtrip
# with the dense-layout fix, native-node timing u8/f32, bench batch sweep.
# Training legs are dispatched separately, sized to the remaining wall
# clock.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session11] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session11] chip UP $(date -u +%FT%TZ)"
}

ensure_chip
$RS --name profile_pipeline --timeout 1800 --allow-fail \
    --artifact reports/profile_pipeline.json --check -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json --trace /tmp/pipeline_trace

ensure_chip
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json

ensure_chip
$RS --name pjrt_node_u8 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp --u8 \
        --weights trained/carlp_v2 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_demo.json
ensure_chip
$RS --name pjrt_node_f32 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_f32.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v2 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_f32.json

for B in 32 96 128; do
    ensure_chip
    YOLO_TPU_BENCH_BATCH=$B $RS --name bench_b$B --timeout 1200 \
        --allow-fail --artifact reports/bench_b$B.json --last-line -- \
        python bench.py
done

python scripts/manifest.py \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/pjrt_node_demo.json reports/pjrt_node_f32.json \
    reports/bench_b32.json reports/bench_b96.json reports/bench_b128.json

echo "=== tpu_session11 done ==="
