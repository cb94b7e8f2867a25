#!/bin/bash
# Round-3 TPU queue (session 4): evidence first, long training last.
#
# Every step goes through scripts/run_step.py (fail-loud: full logs in
# reports/logs/, non-zero exit writes no artifact, empty/invalid JSON is
# a step failure). Ends with a manifest that flags missing artifacts.
#
# Order rationale: the quick judge-evidence items (car_v2 eval, per-stage
# profile+MFU, native full-model roundtrip, native node serving the
# trained flagship, fused-conv bench A/B) land before the ~2 h carlp_v2
# fine-tune, so a round-end cutoff costs at most the carlp numbers.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# 0. wait for the in-flight car_v2 training run_step (pid file) to exit
if [ -f /tmp/train.pid ]; then
    while kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; do sleep 20; done
fi

# 1. package car_v2 + final VOR evals (single-object argmax + multi-car topk)
$RS --name pkg_car_v2 --timeout 600 -- \
    python -m yolo_tpu.tools.package_weights --src runs/car_v2/backup \
        --dst trained/car_v2 --force
$RS --name car_v2_eval --timeout 1200 \
    --artifact reports/eval_car_final.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v2 eval
$RS --name car_v2_eval_multi --timeout 1200 \
    --artifact reports/eval_car_multi.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v2 eval --topk 8

# 2. per-stage profile + decode A/B + MFU (VERDICT #3)
$RS --name profile_pipeline --timeout 2400 --allow-fail \
    --artifact reports/profile_pipeline.json --check -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json --trace /tmp/pipeline_trace

# 3. native serving of the real pipeline (VERDICT #4)
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json
$RS --name pjrt_node_carlp --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v1 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 6 --out reports/pjrt_node_demo.json

# 4. headline bench A/B: fused-conv dispatch on vs off (VERDICT #3)
$RS --name bench_fused_on --timeout 900 \
    --artifact reports/bench_final.json --last-line -- \
    python bench.py
YOLO_TPU_FUSED_CONV=0 $RS --name bench_fused_off --timeout 900 \
    --artifact reports/bench_fused_off.json --last-line -- \
    python bench.py

# 5. carlp_v2 fine-tune: carlp_v1 weights + 3D-sprite multi-object
#    renderer + per-object class CE (the car_v2 recipe), cosine 12k steps
$RS --name carlp_v2_train --timeout 7800 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v2/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v2 train \
            --until-step 12000 --bf16 1 --weight trained/carlp_v1

# 6. package + eval whatever checkpoint landed
$RS --name pkg_carlp_v2 --timeout 600 -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v2/backup \
        --dst trained/carlp_v2 --force
$RS --name carlp_v2_eval --timeout 1500 \
    --artifact reports/eval_carlp_final.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v2 eval

# 7. manifest: every expected artifact must be non-empty valid JSON
python scripts/manifest.py \
    reports/eval_car_final.json reports/eval_car_multi.json \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/pjrt_node_demo.json reports/bench_final.json \
    reports/bench_fused_off.json reports/eval_carlp_final.json

echo "=== tpu_session4 done ==="
