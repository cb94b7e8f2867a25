#!/bin/bash
# Round-5 MFU lever A/B: the space-to-depth stem (models/s2d.py) — an
# EXACT no-retraining remap of conv0 + the stage-1 downsample onto a
# packed (224², 12ch) layout. The trunk decomposition measured the
# original stem at ~12.3 ms of the 34 ms forward at <7% of its FLOPs
# (reports/profile_trunk.json, docs/MFU_CLOSEOUT.md). Exactness is
# locked by tests/test_models.py::test_s2d_stem_exact_remap, so this is
# purely a throughput A/B at the headline bench point — BOTH arms run
# in THIS session so the comparison is same-VM, same-contention:
#   bench_b128_r5.json  = control (stock stem, batch 128)
#   bench_s2d.json      = treatment (YOLO_TPU_S2D=1, batch 128)
# If the s2d arm wins, the builder flips the bench default before the
# final headline bench (phase 8) picks it up.
set -x
cd /root/repo
RS="python scripts/run_step.py"

if [ ! -f reports/bench_b128_r5.json ]; then
    $RS --name bench_b128_r5 --timeout 1800 --retries 1 --allow-fail \
        --artifact reports/bench_b128_r5.json --last-line -- python bench.py
    git add -A reports 2>/dev/null
    git commit -m "Same-session control bench at batch 128 (s2d A/B arm 1)" \
        2>&1 | tail -1 || true
fi

if [ ! -f reports/bench_s2d.json ]; then
    YOLO_TPU_S2D=1 $RS --name bench_s2d --timeout 1800 --retries 1 \
        --allow-fail --artifact reports/bench_s2d.json --last-line -- \
        python bench.py
    git add -A reports 2>/dev/null
    git commit -m "S2D-stem bench A/B point (exact stem remap, batch 128)" \
        2>&1 | tail -1 || true
fi
