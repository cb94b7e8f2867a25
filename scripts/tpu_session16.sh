#!/bin/bash
# Round-4 TPU queue (session 16, small): evidence refreshes that need the
# v3 weights — the real-image transfer eval re-run on lp_v3 (the round's
# convergence leg), then a closing bench. Waits for tpu_session15.sh.
set -x
cd /root/repo
mkdir -p reports

RS="python scripts/run_step.py"

S15_LOG=reports/logs/session15.log
for i in $(seq 1 720); do
    grep -q "tpu_session15 done" "$S15_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session15.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session16] session15 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session16] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session16] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

LPD=trained/lp_v2
[ -d trained/lp_v3 ] && LPD=trained/lp_v3

ensure_chip
$RS --name real_image_v3 --timeout 3000 --allow-fail \
    --artifact reports/real_image_v3.json --check -- \
    python -m yolo_tpu.tools.real_image \
        --lp "$LPD" --ocr trained/ocr_v2 \
        --out reports/real_image_v3.json --save-dir reports/real_image_v3
commit_now "Real-image transfer eval refreshed on the lp_v3 convergence leg"

ensure_chip
$RS --name bench_close_r4 --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
commit_now "session16 queue complete: closing bench"
echo "=== tpu_session16 done ==="
