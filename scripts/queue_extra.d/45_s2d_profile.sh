#!/bin/bash
# Round-5 MFU evidence: re-run the pipeline profile with the s2d stem
# once its bench A/B point exists. The round-4 profile recorded MFU
# 47.1% with the stock stem eating ~12 ms of the 34 ms forward at <7%
# of FLOPs (reports/profile_trunk.json); the s2d remap is the lever the
# MFU close-out named. Verdict bar: MFU >= 55%.
set -x
cd /root/repo
RS="python scripts/run_step.py"

[ -f reports/bench_s2d.json ] || exit 0

if [ ! -f reports/profile_s2d.json ]; then
    $RS --name profile_s2d --timeout 2400 --retries 1 --allow-fail \
        --artifact reports/profile_s2d.json --check -- \
        python -m yolo_tpu.tools.profile_pipeline --s2d \
            --out reports/profile_s2d.json
    git add -A reports 2>/dev/null
    git commit -m "Pipeline profile with the s2d stem (MFU point)" \
        2>&1 | tail -1 || true
fi
