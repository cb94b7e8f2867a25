#!/bin/bash
# Round-3 TPU queue (session 5): re-runs of the steps session 4 lost —
# car_v2 packaging (CPU-starved timeout), per-stage profile (decode
# kernel Mosaic fix), full-model native roundtrip (dense-output gating),
# trained-flagship node serving (weights packed into one argument to fit
# sflag memory) — plus the non-square kernel sweep and a final bench
# with the data-driven fused-conv default (off).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# 0. wait for session 4 (pid file) to finish
if [ -f /tmp/session4.pid ]; then
    while kill -0 "$(cat /tmp/session4.pid)" 2>/dev/null; do sleep 30; done
fi

# 1. package car_v2 (session-4 attempt was killed by a CPU-starved 600 s
#    timeout; orbax copy of 436 MB on the 1-vCPU host needs headroom)
$RS --name pkg_car_v2 --timeout 2400 -- \
    python -m yolo_tpu.tools.package_weights --src runs/car_v2/backup \
        --dst trained/car_v2 --force

# 2. per-stage profile + decode A/B + MFU (decode kernel fixed)
$RS --name profile_pipeline --timeout 2400 --allow-fail \
    --artifact reports/profile_pipeline.json --check -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json --trace /tmp/pipeline_trace

# 3. full-model native roundtrip (dense outputs gate ok)
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json

# 4. native node on the trained flagship (single packed weight argument)
JOINT_W=$([ -d trained/carlp_v2 ] && echo trained/carlp_v2 || echo trained/carlp_v1)
$RS --name pjrt_node_carlp --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights "$JOINT_W" --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 6 --out reports/pjrt_node_demo.json

# 5. kernel sweep at the non-square 320x512 parity operating point
$RS --name bench_conv_320x512 --timeout 1800 --allow-fail \
    --artifact reports/bench_conv_kernel_320x512.json --check -- \
    python -m yolo_tpu.tools.bench_conv_kernel --shapes 320x512 \
        --out reports/bench_conv_kernel_320x512.json

# 6. final headline bench (fused-conv default now off per the A/B)
$RS --name bench_final --timeout 900 \
    --artifact reports/bench_final.json --last-line -- \
    python bench.py

python scripts/manifest.py \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/pjrt_node_demo.json reports/bench_conv_kernel_320x512.json \
    reports/bench_final.json reports/eval_carlp_final.json

echo "=== tpu_session5 done ==="
