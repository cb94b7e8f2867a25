#!/bin/bash
# Logs TPU chip availability every 5 min: a 60s-timeout trivial client.
# Purpose: document transport outage windows (e.g. the 2026-08-17 19:16
# outage where every client blocked in the claim leg for hours) and
# record the heal time so queued sessions' gaps are explainable.
# A killed *waiter* never held a grant, so probing is claim-safe.
OUT=${1:-reports/logs/chip_watch.log}
cd /root/repo
while true; do
    T=$(date -u +%FT%TZ)
    if timeout 60 python -u -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "$T up" >> "$OUT"
    else
        echo "$T DOWN" >> "$OUT"
    fi
    sleep 240
done
