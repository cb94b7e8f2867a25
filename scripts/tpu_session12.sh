#!/bin/bash
# Round-3 TPU queue (session 12): remainder of session 11 reordered
# cheapest-first (bench sweep before the two pjrt_node runs, whose first
# batch pays an ~800 s PJRT compile) so the most evidence lands inside
# the wall-clock budget if the session is cut short.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session12] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session12] chip UP $(date -u +%FT%TZ)"
}

# profiler finding (reports/profile_pipeline.json): the gather unwarp is
# 16.6 ms of the 58.9 ms cascade; the matmul unwarp does the same warp in
# 2.5 ms. A/B its end-to-end accuracy and the bench before flipping the
# pipeline default.
ensure_chip
$RS --name cascade_warp_matmul --timeout 1500 --allow-fail \
    --artifact reports/eval_warp_matmul.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v2 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --warp-impl matmul \
        --out reports/eval_warp_matmul.json
ensure_chip
$RS --name cascade_warp_gather_ctrl --timeout 1500 --allow-fail \
    --artifact reports/eval_warp_gather_ctrl.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v2 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --warp-impl gather \
        --out reports/eval_warp_gather_ctrl.json
ensure_chip
YOLO_TPU_BENCH_WARP=matmul $RS --name bench_warp_matmul --timeout 1200 \
    --allow-fail --artifact reports/bench_warp_matmul.json --last-line -- \
    python bench.py

for B in 32 96 128; do
    ensure_chip
    YOLO_TPU_BENCH_BATCH=$B $RS --name bench_b$B --timeout 1200 \
        --allow-fail --artifact reports/bench_b$B.json --last-line -- \
        python bench.py
done

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

python scripts/manifest.py \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/bench_b32.json reports/bench_b96.json reports/bench_b128.json \
    reports/pjrt_node_demo.json reports/pjrt_node_f32.json

echo "=== tpu_session12 done ==="
