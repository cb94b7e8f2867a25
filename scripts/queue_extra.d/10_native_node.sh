#!/bin/bash
# Round-5 native-node evidence (drained by tpu_session23.sh between
# phases). The round-4 numbers showed the node wall-clock tracks INPUT
# bytes (4.15 MB/batch -> 94 ms, 33 MB -> 1308 ms): the serving
# transport, not the program, is the wall. Three measurements close it:
#   1) transport_sol: the transport's own speed of light through the
#      same C++ shim (sync + pipelined h2d, d2h, RTT) — the table the
#      node's FPS must sit on;
#   2) NV12 ingestion: half the bytes per frame (camera-native 4:2:0,
#      BT.601 on device) — the one legitimate 2x on a bandwidth-bound
#      link; verified node-vs-jax like every other mode;
#   3) depth/batch points: depth 8 was tuned for latency hiding, but on
#      a saturated link more in-flight uploads only add queueing (the
#      depth-16 run REGRESSED 94->171 ms/batch) — measure depth 2/4.
# Each step is self-guarded + idempotent; auto-commits its artifact.
set -x
cd /root/repo

RS="python scripts/run_step.py"
JOINT=trained/carlp_v4
[ -d trained/carlp_v5 ] && JOINT=trained/carlp_v5
OCRW=trained/ocr_v3
[ -d trained/ocr_v4 ] && OCRW=trained/ocr_v4

xcommit() {
    git add -A reports 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# transport_sol is NOT in the automatic drain: its warm execute wedged
# twice on the chip (futex wait; see reports/logs/transport_sol.log) and
# a hang here would re-fire on every drain_extra. Run it manually once
# the queue is idle:
#   python scripts/run_step.py --name transport_sol --timeout 900 \
#       --artifact reports/transport_sol.json --check -- \
#       python -m yolo_tpu.tools.transport_sol --out reports/transport_sol.json
if [ "${YOLO_TPU_SOL:-0}" = "1" ] && [ ! -f reports/transport_sol.json ]; then
    $RS --name transport_sol --timeout 900 --allow-fail \
        --artifact reports/transport_sol.json --check -- \
        python -m yolo_tpu.tools.transport_sol \
            --out reports/transport_sol.json
    xcommit "Transport speed-of-light probe: h2d/d2h bandwidth, RTT, depth curve"
fi

if [ ! -f reports/pjrt_node_nv12_b8.json ]; then
    $RS --name pjrt_node_nv12_b8 --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/pjrt_node_nv12_b8.json --check -- \
        python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
            --weights "$JOINT" --ocr-weights "$OCRW" \
            --u8 --packed --nv12 --depth 4 --batch 8 --batches 16 \
            --out reports/pjrt_node_nv12_b8.json
    xcommit "Native node NV12 ingestion point (batch 8, depth 4)"
fi

if [ ! -f reports/pjrt_node_b8_d2.json ]; then
    $RS --name pjrt_node_b8_d2 --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/pjrt_node_b8_d2.json --check -- \
        python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
            --weights "$JOINT" --ocr-weights "$OCRW" \
            --u8 --packed --depth 2 --batch 8 --batches 16 \
            --out reports/pjrt_node_b8_d2.json
    xcommit "Native node RGB depth-2 point (queueing vs latency-hiding)"
fi

if [ ! -f reports/pjrt_node_nv12_b16.json ]; then
    $RS --name pjrt_node_nv12_b16 --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/pjrt_node_nv12_b16.json --check -- \
        python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
            --weights "$JOINT" --ocr-weights "$OCRW" \
            --u8 --packed --nv12 --depth 4 --batch 16 --batches 16 \
            --out reports/pjrt_node_nv12_b16.json
    xcommit "Native node NV12 batch-16 point"
fi
