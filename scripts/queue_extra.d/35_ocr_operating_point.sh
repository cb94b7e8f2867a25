#!/bin/bash
# Round-5 97%-exact close-out: decode-level OCR operating-point sweep +
# failure diagnosis on the high-n cascade distribution (same seed as
# eval_cascade_highn_ocr4.json). One device run answers (a) whether the
# reference's hard-coded 0.6 peak threshold (OCR/OCR.py:180-201) is the
# right serving point for lp_v5 x ocr_v4, and (b) whether the ~4%
# residual is pose-driven (low corner IoU on failures) or OCR-driven
# (substitutions at good poses). Gated behind the bench sweep so the
# headline probes land first.
set -x
cd /root/repo
RS="python scripts/run_step.py"

[ -f reports/bench_b160.json ] || exit 0
[ -f reports/bench_b192.json ] || exit 0

if [ ! -f reports/ocr_operating_point.json ]; then
    $RS --name ocr_operating_point --timeout 3000 --retries 1 --allow-fail \
        --artifact reports/ocr_operating_point.json --check -- \
        python -m yolo_tpu.tools.ocr_operating_point \
            --lp trained/lp_v5 --ocr trained/ocr_v4 --batches 16 \
            --out reports/ocr_operating_point.json
    git add -A reports 2>/dev/null
    git commit -m "OCR operating-point sweep + cascade failure diagnosis (97% close-out)" \
        2>&1 | tail -1 || true
fi
