#!/bin/bash
# Round-3 TPU queue (session 9): consolidated replacement for the tails
# of sessions 6/7/8, written during the 19:16 transport outage (every
# client since then blocked in the claim leg — see
# reports/logs/chip_watch.log for the outage window).
#
# Changes vs the killed queue:
#  * waits for the chip to actually answer before EVERY step — a dead
#    transport no longer burns hours of per-step timeouts;
#  * evidence-first ordering: the cheap missing artifacts (profiler,
#    PJRT roundtrip with the layout fix, native-node timing, bench
#    sweep) land before the three multi-hour training legs.
set -x
cd /root/repo
mkdir -p reports trained

RS="python scripts/run_step.py"

ensure_chip() {
    # probe until a trivial client can list devices (claim-safe: a
    # killed waiter never held a grant)
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session9] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 240
    done
    echo "[session9] chip UP $(date -u +%FT%TZ)"
}

# ---- phase A: cheap evidence ------------------------------------------
ensure_chip
$RS --name profile_pipeline --timeout 1800 --allow-fail \
    --artifact reports/profile_pipeline.json --check -- \
    python -m yolo_tpu.tools.profile_pipeline \
        --out reports/profile_pipeline.json --trace /tmp/pipeline_trace

ensure_chip
$RS --name pjrt_roundtrip_full --timeout 1800 --allow-fail \
    --artifact reports/pjrt_roundtrip.json --check -- \
    python -m yolo_tpu.tools.pjrt_roundtrip --full \
        --out reports/pjrt_roundtrip.json

ensure_chip
$RS --name pjrt_node_u8 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_demo.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp --u8 \
        --weights trained/carlp_v2 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_demo.json
ensure_chip
$RS --name pjrt_node_f32 --timeout 2400 --allow-fail \
    --artifact reports/pjrt_node_f32.json --check -- \
    python -m yolo_tpu.tools.pjrt_node_demo --model carlp \
        --weights trained/carlp_v2 --ocr-weights trained/ocr_v2 \
        --batch 8 --batches 8 --out reports/pjrt_node_f32.json

for B in 32 96 128; do
    ensure_chip
    YOLO_TPU_BENCH_BATCH=$B $RS --name bench_b$B --timeout 1200 \
        --allow-fail --artifact reports/bench_b$B.json --last-line -- \
        python bench.py
done

python scripts/manifest.py \
    reports/profile_pipeline.json reports/pjrt_roundtrip.json \
    reports/pjrt_node_demo.json reports/pjrt_node_f32.json \
    reports/bench_b32.json reports/bench_b96.json reports/bench_b128.json

# ---- phase B: car_v3 (anchor refit; box-IoU 0.85 target) ---------------
ensure_chip
$RS --name car_v3_train --timeout 12600 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/car_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car runs/car_v3 train \
            --until-step 12000 --bf16 1 --weight trained/car_v2
$RS --name pkg_car_v3 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/car_v3/backup \
        --dst trained/car_v3 --force
ensure_chip
$RS --name car_v3_eval --timeout 1200 --allow-fail \
    --artifact reports/eval_car_v3.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval
ensure_chip
$RS --name car_v3_eval_multi --timeout 1200 --allow-fail \
    --artifact reports/eval_car_v3_multi.json --last-line -- \
    python -m yolo_tpu.apps.car runs/car_v3 eval --topk 8

# ---- phase C: lp_v3 (corner IoU 0.90 -> cascade >=95% target) ----------
ensure_chip
$RS --name lp_v3_train --timeout 9000 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/lp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.lp_detection runs/lp_v3 train \
            --until-step 12000 --bf16 1 --weight trained/lp_v2
$RS --name pkg_lp_v3 --timeout 1200 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/lp_v3/backup \
        --dst trained/lp_v3 --force
ensure_chip
$RS --name cascade_v3_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_cascade_v3.json --check -- \
    python -m yolo_tpu.tools.cascade_eval \
        --lp trained/lp_v3 --ocr trained/ocr_v2 \
        --batches 8 --with-lpd --out reports/eval_cascade_v3.json

# ---- phase D: carlp_v3 (joint anchor refit) ----------------------------
ensure_chip
$RS --name carlp_v3_train --timeout 12600 --allow-fail -- \
    python scripts/watchdog_train.py \
        --metrics runs/carlp_v3/logs/metrics.jsonl --stale 420 --grace 1500 -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 train \
            --until-step 12000 --bf16 1 --weight trained/carlp_v2
$RS --name pkg_carlp_v3 --timeout 2400 --allow-fail -- \
    python -m yolo_tpu.tools.package_weights --src runs/carlp_v3/backup \
        --dst trained/carlp_v3 --force
ensure_chip
$RS --name carlp_v3_eval --timeout 1500 --allow-fail \
    --artifact reports/eval_carlp_v3.json --last-line -- \
    python -m yolo_tpu.apps.car_and_lp runs/carlp_v3 eval

# ---- phase E: final headline bench (prefers newest packaged weights) ---
ensure_chip
$RS --name bench_final_r3 --timeout 900 --allow-fail \
    --artifact reports/bench_final.json --last-line -- \
    python bench.py

python scripts/manifest.py \
    reports/eval_car_v3.json reports/eval_car_v3_multi.json \
    reports/eval_cascade_v3.json reports/eval_carlp_v3.json \
    reports/bench_final.json

echo "=== tpu_session9 done ==="
