#!/bin/bash
# Round-4 TPU queue (session 20, tail): cheap evidence sweeps once all
# training legs are done. Waits for tpu_session19.sh, then:
#   A) bench probes at batch 160 / 192 (is 128 really the knee?)
#   B) high-n fused-cascade eval (16 batches) on the best lp x ocr combo
#   C) final headline bench + manifest
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

S19_LOG=reports/logs/session19.log
for i in $(seq 1 720); do
    grep -q "tpu_session19 done" "$S19_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session19.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session20] session19 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session20] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session20] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- phase A: batch probes past the 128 knee ----------------------------
for b in 160 192; do
    ensure_chip
    YOLO_TPU_BENCH_BATCH=$b $RS --name "bench_b${b}" --timeout 900 \
        --allow-fail --artifact "reports/bench_b${b}.json" --last-line -- \
        python bench.py
done
commit_now "Batch probes 160/192 at the matmul rectification balance"

# ---- phase B: high-n cascade confirmation --------------------------------
LPW=trained/lp_v3
[ -d trained/lp_v4 ] && LPW=trained/lp_v4
OCRW=trained/ocr_v2
[ -d trained/ocr_v3 ] && OCRW=trained/ocr_v3
ensure_chip
$RS --name cascade_highn --timeout 2400 --allow-fail \
    --artifact reports/eval_cascade_highn.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp "$LPW" --ocr "$OCRW" \
        --batches 16 --out reports/eval_cascade_highn.json
commit_now "High-n (512-plate) fused-cascade eval on the best lp x ocr combo"

# ---- phase C: final headline bench + manifest ----------------------------
ensure_chip
$RS --name bench_final_r4e --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/bench_b160.json reports/bench_b192.json \
    reports/eval_cascade_highn.json reports/bench_final.json \
    2>/dev/null || true
commit_now "session20 queue complete: batch probes + high-n cascade + final bench"
echo "=== tpu_session20 done ==="
