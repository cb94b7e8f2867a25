#!/bin/bash
# Round-5 FINAL queue, revision 2 (session 25). Supersedes the tail of
# tpu_session24.sh: the driver's PROGRESS clock shows the round started
# ~45 min before the builder's first turn, so the s2d headline A/B was
# going to fall off the end behind two ~30-min evidence evals. This
# revision runs it right after the flagship evals (bench legs are the
# shortest chip steps and set BENCH_r05's configuration via
# reports/bench_defaults.json). session24's parent bash was killed
# mid-phase-1 (the carlp_v6 training run_step child kept running,
# unparented); this queue waits for the chip to free, then finishes the
# phase-1 tail (package + commit) itself.
set -x
cd /root/repo
mkdir -p reports trained runs scripts/queue_extra.d

RS="python scripts/run_step.py"

# ---- wait until no training/eval process owns the chip ------------------
for i in $(seq 1 240); do
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        if tr '\0' ' ' < "$p" 2>/dev/null | \
                grep -qE "watchdog_train|yolo_tpu\.(apps|tools)"; then
            alive=1; break
        fi
    done
    [ "$alive" = 0 ] && break
    sleep 60
done
echo "[session25] chip free $(date -u +%FT%TZ)"

ensure_chip() {
    local n=0
    until timeout 90 python -u -c "import jax; jax.devices()" \
            >/dev/null 2>&1; do
        n=$((n + 1))
        echo "[session25] chip DOWN (probe $n) $(date -u +%FT%TZ)"
        sleep 120
    done
    echo "[session25] chip UP $(date -u +%FT%TZ)"
}

commit_now() {
    git add -A reports trained runs 2>/dev/null
    git commit -m "$1" 2>&1 | tail -1 || true
}

drain_extra() {
    for s in scripts/queue_extra.d/*.sh; do
        [ -f "$s" ] || continue
        echo "[session25] extra step: $s"
        bash "$s" || true
    done
}

# ---- P1: finish the carlp_v6 phase-1 tail ---------------------------------
if [ ! -d trained/carlp_v6 ] && [ -d runs/carlp_v6/backup ]; then
    ensure_chip
    $RS --name pkg_carlp_v6 --timeout 1200 --allow-fail -- \
        python -m yolo_tpu.tools.package_weights --src runs/carlp_v6/backup \
            --dst trained/carlp_v6 --force
    commit_now "carlp_v6: Z-repriced corner leg from carlp_v5 (6k of 8k cosine)"
fi

# ---- P2: carlp_v6 evals (flagship gates) ----------------------------------
if [ -d trained/carlp_v6 ] && [ ! -f reports/eval_carlp_v6.json ]; then
    ensure_chip
    $RS --name carlp_v6_eval --timeout 3000 --retries 1 --allow-fail \
        --artifact reports/eval_carlp_v6.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6
    commit_now "carlp_v6 eval: joint pose (Z-repriced corner leg)"
fi
if [ -d trained/carlp_v6 ] && [ ! -f reports/eval_carlp_v6_cascade.json ]; then
    ensure_chip
    $RS --name carlp_v6_cascade --timeout 3000 --retries 1 --allow-fail \
        --artifact reports/eval_carlp_v6_cascade.json --last-line -- \
        python -m yolo_tpu.apps.car_and_lp runs/carlp_v6 eval \
            --weight trained/carlp_v6 --cascade 1
    commit_now "carlp_v6 eval: fused joint cascade (Z-repriced corner leg)"
fi

# ---- P3: s2d headline A/B (sets BENCH_r05's configuration) ----------------
if [ ! -f reports/bench_b128_r5.json ]; then
    ensure_chip
    $RS --name bench_b128_r5 --timeout 1800 --retries 1 --allow-fail \
        --artifact reports/bench_b128_r5.json --last-line -- python bench.py
    commit_now "Same-session control bench at batch 128 (s2d A/B arm 1)"
fi
if [ ! -f reports/bench_s2d.json ]; then
    ensure_chip
    YOLO_TPU_S2D=1 $RS --name bench_s2d --timeout 1800 --retries 1 \
        --allow-fail --artifact reports/bench_s2d.json --last-line -- \
        python bench.py
    commit_now "S2D-stem bench A/B point (exact stem remap, batch 128)"
fi
bash scripts/queue_extra.d/05_pick_bench_point.sh || true

# ---- P4: car_v4 single-object eval (round-4 casualty) ---------------------
if [ ! -f reports/eval_car_v4.json ]; then
    ensure_chip
    $RS --name car_v4_eval --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/eval_car_v4.json --last-line -- \
        python -m yolo_tpu.apps.car runs/car_v4 eval --weight trained/car_v4
    commit_now "car_v4 single-object eval (retry-on-timeout leg)"
fi

# ---- P5: real_image_v5 (noise-stress re-eval on lp_v5) --------------------
if [ ! -f reports/real_image_v5.json ]; then
    ensure_chip
    $RS --name real_image_v5 --timeout 3600 --retries 1 --allow-fail \
        --artifact reports/real_image_v5.json --check -- \
        python -m yolo_tpu.tools.real_image --lp trained/lp_v5 \
            --ocr trained/ocr_v3 \
            --out reports/real_image_v5.json --save-dir reports/real_image_v5
    commit_now "Real-image transfer re-eval on lp_v5 (noise-stress target)"
fi

# ---- P6: bench batch sweep 160/192 ----------------------------------------
for b in 160 192; do
    if [ ! -f "reports/bench_b${b}.json" ]; then
        ensure_chip
        YOLO_TPU_BENCH_BATCH=$b YOLO_TPU_S2D=0 \
            $RS --name "bench_b${b}" --timeout 1800 \
            --retries 1 --allow-fail \
            --artifact "reports/bench_b${b}.json" --last-line -- python bench.py
        commit_now "bench batch-$b probe (round-4 stranded sweep point)"
    fi
done
bash scripts/queue_extra.d/05_pick_bench_point.sh || true

# ---- P7: remaining evidence (hybrid point, ocr sweep, s2d profile, node) --
drain_extra

# ---- P8: car_v5 short multi-object leg (cut first if clock runs out) ------
if [ ! -d trained/car_v5 ]; then
    ensure_chip
    $RS --name car_v5_train --timeout 4200 --allow-fail -- \
        python scripts/watchdog_train.py \
            --metrics runs/car_v5/logs/metrics.jsonl --stale 420 \
            --grace 1800 -- \
            python -m yolo_tpu.apps.car runs/car_v5 train \
                --until-step 2500 --bf16 1 --weight trained/car_v4
    $RS --name pkg_car_v5 --timeout 1200 --allow-fail -- \
        python -m yolo_tpu.tools.package_weights --src runs/car_v5/backup \
            --dst trained/car_v5 --force
    commit_now "car_v5: multi-object continuation to 2.5k (wall-clock-fit leg)"
fi
if [ -d trained/car_v5 ] && [ ! -f reports/eval_car_v5_mo3_s0.3.json ]; then
    ensure_chip
    $RS --name car_v5_mo3_s0.3 --timeout 2400 --retries 1 --allow-fail \
        --artifact reports/eval_car_v5_mo3_s0.3.json --last-line -- \
        python -m yolo_tpu.apps.car runs/car_v5 eval --weight trained/car_v5 \
            --topk 8 --num-obj 3 --nms-iou 0.45 --score-thresh 0.3
    commit_now "car_v5 multi-object eval (3 cars, score 0.3)"
fi

# ---- P9: final headline bench + manifest ----------------------------------
ensure_chip
$RS --name bench_final_r5 --timeout 1800 --retries 1 --allow-fail \
    --artifact reports/bench_final.json --last-line -- python bench.py
python scripts/manifest.py \
    reports/eval_carlp_v6.json reports/eval_carlp_v6_cascade.json \
    reports/eval_car_v4.json reports/real_image_v5.json \
    reports/bench_final.json 2>/dev/null || true
commit_now "session25 queue complete: round-5 final evidence + bench"
echo "=== tpu_session25 done ==="
