#!/bin/bash
# TPU work queue, run serially after the LPD leg-2 training finishes.
# One process at a time on the single chip (see verify skill gotchas).
set -x
cd /root/repo
mkdir -p reports

# 1. per-stage pipeline profile (drives the Pallas/README decisions)
timeout 1200 python -m yolo_tpu.tools.profile_pipeline \
    --out reports/profile_pipeline.json

# 2. fused conv kernel vs XLA on flagship shapes
timeout 1200 python -m yolo_tpu.tools.bench_conv_kernel \
    --out reports/bench_conv_kernel.json

# 2b. fully native serving node end-to-end (ring -> PJRT executable)
timeout 900 python -m yolo_tpu.tools.pjrt_node_demo \
    --out reports/pjrt_node_demo.json

# 3. LPD leg-2 + cascade eval (current OCR weights)
timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp runs/lp_v2/backup --ocr trained/ocr_v1_cascade \
    --batches 6 --with-lpd --out reports/eval_lpd_leg2.json

# 4. unwarp-resolution accuracy A/B (bench setting vs pipeline default)
timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp runs/lp_v2/backup --ocr trained/ocr_v1_cascade \
    --batches 6 --sample-hw 64x160 --out reports/eval_unwarp_64x160.json
timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp runs/lp_v2/backup --ocr trained/ocr_v1_cascade \
    --batches 6 --sample-hw 80x192 --out reports/eval_unwarp_80x192.json

# 5. OCR retrain matched to the new LPD error distribution
timeout 4000 python -m yolo_tpu.apps.ocr runs/ocr_v2 train --steps 6000 \
    --bf16 1 --weight trained/ocr_v1_cascade
timeout 900 python -m yolo_tpu.tools.cascade_eval \
    --lp runs/lp_v2/backup --ocr runs/ocr_v2/backup \
    --batches 6 --sample-hw 64x160 --out reports/eval_cascade_ocr_v2.json

# 6. OCR score-loss A/B (reference logistic vs framework regression)
timeout 2000 python -m yolo_tpu.apps.ocr runs/ocr_ab_log train \
    --steps 1500 --bf16 1
timeout 600 python -m yolo_tpu.apps.ocr runs/ocr_ab_log eval 2>/dev/null | tail -1 \
    > reports/ocr_ab_logistic.json
timeout 2000 python -m yolo_tpu.apps.ocr runs/ocr_ab_reg train \
    --steps 1500 --bf16 1
timeout 600 python -m yolo_tpu.apps.ocr runs/ocr_ab_reg eval 2>/dev/null | tail -1 \
    > reports/ocr_ab_regression.json

echo "=== tpu_session1 done ==="
