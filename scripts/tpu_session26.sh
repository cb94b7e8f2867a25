#!/bin/bash
# Round-5 endgame drain (session 26). Takes over from tpu_session25.sh
# after the s2d A/B lands: the remaining runway (~1h) cannot fit
# session25's P4-P9 plus extras, so this queue runs the highest-value
# remainder in strict priority order with a hard deadline guard —
# each leg launches only if enough runway remains for its budget, so
# nothing straddles the driver's end-of-round bench.
#   1. pick bench defaults from measured points (instant)
#   2. joint cascade x ocr_v4 (flagship pairing probe)
#   3. car_v4 single-object eval (r4 dead-run re-land)
#   4. real_image_v5 (r4 dead-run re-land)
#   5. bench b160 (stranded sweep point)
#   6. re-pick defaults + final manifest
# DEADLINE: epoch seconds after which no new leg starts.
set -x
cd /root/repo
RS="python scripts/run_step.py"
DEADLINE=${DEADLINE:-$(date -d '2026-08-21 02:12:00 UTC' +%s)}

left() { echo $(( DEADLINE - $(date +%s) )); }

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

bash scripts/queue_extra.d/05_pick_bench_point.sh || true
commit_now "Bench defaults from the r5 measured A/B (session26 takeover)"

# 2. joint cascade x ocr_v4 — warm graph (same shape as the ocr_v3 leg)
if [ ! -f reports/eval_carlp_v6_cascade_ocr4.json ] && [ "$(left)" -gt 1500 ]; then
    $RS --name carlp_v6_cascade_ocr4 --timeout "$(left)" --allow-fail \
        --artifact reports/eval_carlp_v6_cascade_ocr4.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6 --cascade 1 \
            --ocr-weight trained/ocr_v4
    commit_now "Joint cascade x ocr_v4 probe (crop-distribution pairing)"
fi

# 3. car_v4 single-object eval (twice dead on cold-compile timeouts)
if [ ! -f reports/eval_car_v4.json ] && [ "$(left)" -gt 1600 ]; then
    $RS --name car_v4_eval --timeout "$(left)" --allow-fail \
        --artifact reports/eval_car_v4.json --last-line -- \
        python -m yolo_tpu.apps.car runs/car_v4 eval --weight trained/car_v4
    commit_now "car_v4 single-object eval (re-land of the r4 dead run)"
fi

# 4. real_image_v5: lp_v5 noise-stress re-eval (r4 dead run)
if [ ! -f reports/real_image_v5.json ] && [ "$(left)" -gt 1600 ]; then
    $RS --name real_image_v5 --timeout "$(left)" --allow-fail \
        --artifact reports/real_image_v5.json --check -- \
        python -m yolo_tpu.tools.real_image --lp trained/lp_v5 \
            --ocr trained/ocr_v3 \
            --out reports/real_image_v5.json --save-dir reports/real_image_v5
    commit_now "Real-image transfer re-eval on lp_v5 (noise-stress target)"
fi

# 5. one stranded sweep point if runway allows a cold compile
if [ ! -f reports/bench_b160.json ] && [ "$(left)" -gt 1400 ]; then
    YOLO_TPU_BENCH_BATCH=160 YOLO_TPU_S2D=0 \
        $RS --name bench_b160 --timeout "$(left)" --allow-fail \
        --artifact reports/bench_b160.json --last-line -- python bench.py
    commit_now "bench batch-160 probe (round-4 stranded sweep point)"
fi

# 6. final defaults + manifest
bash scripts/queue_extra.d/05_pick_bench_point.sh || true
python scripts/manifest.py \
    reports/eval_carlp_v6.json reports/eval_carlp_v6_cascade.json \
    reports/eval_carlp_v6_cascade_ocr4.json reports/eval_car_v4.json \
    reports/real_image_v5.json reports/bench_b128_r5.json \
    reports/bench_s2d.json 2>/dev/null || true
commit_now "session26 endgame drain complete"
echo "=== tpu_session26 done ==="
