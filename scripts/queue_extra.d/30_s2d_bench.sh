#!/bin/bash
# Round-5 MFU lever A/B: the space-to-depth stem (models/s2d.py) — an
# EXACT no-retraining remap of conv0 + the stage-1 downsample onto a
# packed (224², 12ch) layout. The trunk decomposition measured the
# original stem at ~12.3 ms of the 34 ms forward at <7% of its FLOPs
# (reports/profile_trunk.json, docs/MFU_CLOSEOUT.md). Exactness is
# locked by tests/test_models.py::test_s2d_stem_exact_remap (outputs
# match to 2e-4 with converted trained-shape weights), so this A/B is
# purely a throughput measurement at the headline bench point.
set -x
cd /root/repo
RS="python scripts/run_step.py"

if [ ! -f reports/bench_s2d.json ]; then
    YOLO_TPU_S2D=1 $RS --name bench_s2d --timeout 1800 --retries 1 \
        --allow-fail --artifact reports/bench_s2d.json --last-line -- \
        python bench.py
    git add -A reports 2>/dev/null
    git commit -m "S2D-stem bench A/B point (exact stem remap, batch 128)" \
        2>&1 | tail -1 || true
fi
