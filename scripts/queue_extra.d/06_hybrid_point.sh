#!/bin/bash
# Conditional hybrid bench point: if the batch sweep's winner is NOT
# 128 AND the s2d stem beat the stock stem at 128, the best measured
# points leave the (best-batch + s2d) combination unmeasured — probe it
# once so 05_pick_bench_point can adopt it. No-ops otherwise.
set -x
cd /root/repo
RS="python scripts/run_step.py"

for f in reports/bench_b128_r5.json reports/bench_s2d.json \
         reports/bench_b160.json reports/bench_b192.json; do
    [ -f "$f" ] || exit 0
done
[ -f reports/bench_hybrid.json ] && exit 0

HB=$(python - <<'PY'
import json
g = lambda p: json.load(open(p))["value"]
b128 = g("reports/bench_b128_r5.json"); s2d = g("reports/bench_s2d.json")
pts = {160: g("reports/bench_b160.json"), 192: g("reports/bench_b192.json")}
best_b = max([128] + [b for b, v in pts.items() if v > b128],
             key=lambda b: pts.get(b, b128))
print(best_b if (s2d > b128 and best_b != 128) else 0)
PY
)
if [ "$HB" != "0" ]; then
    YOLO_TPU_BENCH_BATCH=$HB YOLO_TPU_S2D=1 \
        $RS --name bench_hybrid --timeout 1800 --retries 1 --allow-fail \
        --artifact reports/bench_hybrid.json --last-line -- python bench.py
    git add -A reports 2>/dev/null
    git commit -m "Hybrid bench point: s2d stem at the sweep-winning batch" \
        2>&1 | tail -1 || true
fi
bash scripts/queue_extra.d/05_pick_bench_point.sh
