#!/bin/bash
# Round-3 TPU queue (session 8): the two evidence items blocked on code
# fixes that have now landed, plus the bench sweep the chip-wedge ate.
#
#  A. per-stage pipeline profile + MFU + trace (VERDICT #3) — the decode
#     kernel's dynamic_slice is gone (one-hot row extraction), so the
#     pallas decode A/B inside the profiler can actually lower now
#  B. full-pipeline PJRT roundtrip (VERDICT #4) — ps_execute now requests
#     an explicit dense row-major host layout, which should close the
#     rel-err~1.3 permuted-output signature
#  C. native node timing on the trained flagship with the raw-u8 ingest
#     path (4x less H2D than f32) vs the f32 path
#  D. bench batch sweep retry (b32/b96/b128 died on the wedged claim)
set -x
cd /root/repo
mkdir -p reports

RS="python scripts/run_step.py"

# 0. wait for session 7 (pid file) to finish
if [ -f /tmp/session7.pid ]; then
    while kill -0 "$(cat /tmp/session7.pid)" 2>/dev/null; do sleep 30; done
fi

JOINT_W=$([ -d trained/carlp_v3 ] && echo trained/carlp_v3 || echo trained/carlp_v2)

# A. per-stage profile + trace + MFU
$RS --name profile_pipeline --timeout 1800 --allow-fail \
    --artifact reports/profile_pipeline.json --check -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json --trace /tmp/pipeline_trace

# B. full-pipeline roundtrip through the C++ PJRT shim
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json

# C. native node on the trained flagship: u8 ingest (primary record),
#    then f32 for the H2D A/B in the same log
$RS --name pjrt_node_u8 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp --u8 \
        --weights "$JOINT_W" --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_demo.json
$RS --name pjrt_node_f32 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_f32.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT_W" --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_f32.json

# D. bench batch sweep retry
for B in 32 96 128; do
    YOLO_TPU_BENCH_BATCH=$B $RS --name bench_b$B --timeout 1200 --allow-fail \
        --artifact reports/bench_b$B.json --last-line -- \
        python bench.py
done

python scripts/manifest.py \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/pjrt_node_demo.json reports/pjrt_node_f32.json \
    reports/bench_b32.json reports/bench_b96.json reports/bench_b128.json

echo "=== tpu_session8 done ==="
