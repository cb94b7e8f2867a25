#!/bin/bash
# Round-5 MFU evidence: decompose the joint forward (34.3 ms of the
# 44.8 ms cascade, reports/profile_pipeline.json) into backbone stages,
# car pyramid, and the 5-block LP branch. Analytic FLOPs say the LP
# branch alone is ~18 GFLOP/frame (more than the backbone); this run
# decides which component the next MFU lever targets — or provides the
# measured close-out if every component already sits near its roofline.
set -x
cd /root/repo
RS="python scripts/run_step.py"

if [ ! -f reports/profile_trunk.json ]; then
    $RS --name profile_trunk --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/profile_trunk.json --check -- \
        python -m yolo_tpu.tools.profile_pipeline --trunk \
            --out reports/profile_trunk.json
    git add -A reports 2>/dev/null
    git commit -m "Trunk decomposition profile: backbone stages vs pyramid vs LP branch" \
        2>&1 | tail -1 || true
fi
