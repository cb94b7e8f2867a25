#!/bin/bash
# Round-3 TPU queue (session 12): follow-ups to session 11's findings.
#  * pjrt_roundtrip retry — the Strides host layout the round-2 fix asked
#    for is rejected by the axon plugin; the shim now requests a tile-less
#    Tiled row-major layout (native/pjrt_shim.cpp), matching jaxlib.
#  * gather-vs-matmul unwarp: the profiler shows the gather rectification
#    is 16.6 ms of the 58.9 ms cascade while the matmul variant runs in
#    2.5 ms; A/B its end-to-end accuracy (control = committed
#    reports/eval_final_cascade.json, gather, 92.6% exact) and bench it.
#  * pjrt_node u8 retry with the fixed shim.
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

# never run two TPU jobs at once
if [ -f /tmp/session11.pid ]; then
    while kill -0 "$(cat /tmp/session11.pid)" 2>/dev/null; do
        echo "[session12] waiting for session11 $(date -u +%FT%TZ)"
        sleep 60
    done
fi

ensure_chip
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json

ensure_chip
$RS --name cascade_warp_matmul --timeout 1500 --allow-fail \
    --artifact reports/eval_warp_matmul.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v2 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --warp-impl matmul \
        --out reports/eval_warp_matmul.json

ensure_chip
YOLO_TPU_BENCH_WARP=matmul $RS --name bench_warp_matmul --timeout 1200 \
    --allow-fail --artifact reports/bench_warp_matmul.json --last-line -- \
    python bench.py

ensure_chip
$RS --name pjrt_node_u8 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp --u8 \
        --weights trained/carlp_v2 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_demo.json

python scripts/manifest.py \
    reports/pjrt_roundtrip.json reports/eval_warp_matmul.json \
    reports/bench_warp_matmul.json reports/pjrt_node_demo.json

echo "=== tpu_session12 done ==="
