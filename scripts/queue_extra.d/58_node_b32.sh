#!/bin/bash
# Round-5 native-node final point: NV12 batch 32, depth 4. The measured
# curve (88 ms @ b8, 116 ms @ b16, both NV12/d4) fits a ~60 ms/harvest
# floor + ~3.5 ms/frame marginal transport cost, putting the b32
# asymptote near 200 FPS — the best point the axon tunnel's bandwidth
# admits (the RGB b64 run showed large single transfers degrade
# super-linearly, so b32 NV12, half the bytes, is the sweet spot).
# Gated behind the bench sweep: runs on the queue_extra drain AFTER
# phase 6 so the headline bench probes land first.
set -x
cd /root/repo
RS="python scripts/run_step.py"

[ -f reports/bench_b160.json ] || exit 0
[ -f reports/bench_b192.json ] || exit 0

JOINT=trained/carlp_v5
[ -d trained/carlp_v6 ] && JOINT=trained/carlp_v6
OCRW=trained/ocr_v4

if [ ! -f reports/pjrt_node_nv12_b32.json ]; then
    $RS --name pjrt_node_nv12_b32 --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/pjrt_node_nv12_b32.json --check -- \
        python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
            --weights "$JOINT" --ocr-weights "$OCRW" \
            --u8 --packed --nv12 --depth 4 --batch 32 --batches 12 \
            --out reports/pjrt_node_nv12_b32.json
    git add -A reports 2>/dev/null
    git commit -m "Native node NV12 batch-32 point (harvest-floor amortization)" \
        2>&1 | tail -1 || true
fi
