#!/bin/bash
# Joint cascade x ocr_v4 probe: carlp_v6's joint cascade hit 91.1%
# exact with ocr_v3 (reports/eval_carlp_v6_cascade.json). ocr_v4 was
# re-matched to the lp_v5 crop distribution and bought +0.6 exact on
# the standalone cascade (95.3 -> 95.9, eval_cascade_highn_ocr4.json);
# the joint net's noisier crops (corner IoU 0.847 vs 0.901) are exactly
# the distribution ocr_v4 was trained to tolerate, so the pairing is
# the cheapest remaining joint-cascade lever (~8 min warm). Same eval,
# same 192 samples, only the OCR weights change.
set -x
cd /root/repo
RS="python scripts/run_step.py"

if [ -d trained/carlp_v6 ] && [ -d trained/ocr_v4 ] && \
        [ ! -f reports/eval_carlp_v6_cascade_ocr4.json ]; then
    $RS --name carlp_v6_cascade_ocr4 --timeout 2400 --retries 1 \
        --allow-fail \
        --artifact reports/eval_carlp_v6_cascade_ocr4.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6 --cascade 1 \
            --ocr-weight trained/ocr_v4
    git add -A reports 2>/dev/null
    git commit -m "Joint cascade x ocr_v4 probe (crop-distribution pairing)" \
        2>&1 | tail -1 || true
fi
