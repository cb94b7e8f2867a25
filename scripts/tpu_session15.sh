#!/bin/bash
# Round-4 TPU queue (session 15): the joint-accuracy leg that closes the
# round. Waits for tpu_session14.sh (one chip serializes jobs), then:
#   A) carlp_v4 fine-tune from carlp_v3 with the LP branch's signal
#      boosted (LP_z scale x2, lp_add_rate 0.8) — VERDICT r3 #2's
#      joint-vs-standalone gap (0.761 corner / 189 mm Z at v3)
#   B) joint eval + the NEW fused-cascade-on-the-joint-net eval
#      (apps.car_and_lp eval --cascade 1) the round-3 judge asked for
#   C) pallas fused-conv A/B re-run at the matmul-default balance
#      (VERDICT r3 #6: "re-try the Pallas conv on the post-flip profile")
#   D) final headline bench + manifest
# Every phase auto-commits (an outage must never strand evidence).
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

# ---- wait for session14 (marker in its log, or its shell gone) --------
S14_LOG=reports/logs/session14.log
for i in $(seq 1 720); do
    grep -q "tpu_session14 done" "$S14_LOG" 2>/dev/null && break
    if ! ls /proc/*/cmdline >/dev/null 2>&1; then break; fi
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | grep -q "tpu_session14.sh"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session15] session14 finished/absent $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session15] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session15] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

# ---- phase A: carlp_v4 LP-boosted fine-tune ----------------------------
ensure_chip
$RS --name carlp_v4_train --timeout 11400 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v4/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 train \
            --until-step 10000 --bf16 1 --weight trained/carlp_v3
$RS --name pkg_carlp_v4 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v4/backup \
        --dst trained/carlp_v4 --force
commit_now "carlp_v4 joint leg: LP-signal-boosted bf16 fine-tune from carlp_v3"

# ---- phase B: joint eval + fused-cascade-on-the-joint-net eval ----------
ensure_chip
$RS --name carlp_v4_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_carlp_v4.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 eval
ensure_chip
$RS --name carlp_v4_cascade --timeout 2400 --allow-fail \
    --artifact reports/eval_carlp_v4_cascade.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v4 eval --cascade 1 \
        --ocr-weight trained/ocr_v2
commit_now "carlp_v4 evals: joint pose + fused cascade on the joint net"

# ---- phase C: pallas fused-conv A/B at the matmul default ---------------
ensure_chip
YOLO_TPU_FUSED_CONV=1 $RS --name bench_fused_r4 --timeout 1200 --allow-fail \
    --artifact reports/bench_fused_on_r4.json --last-line -- python bench.py
commit_now "Pallas fused-conv A/B re-run at the matmul-default balance"

# ---- phase D: final headline bench + manifest ---------------------------
ensure_chip
$RS --name bench_final_r4b --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/eval_carlp_v4.json reports/eval_carlp_v4_cascade.json \
    reports/bench_fused_on_r4.json reports/bench_final.json || true
commit_now "session15 queue complete: carlp_v4 legs + final bench + manifest"
echo "=== tpu_session15 done ==="
