#!/usr/bin/env bash
# Serial TPU re-measurement at HEAD (the chip is single-claim: never
# run two of these at once). Each leg logs to $OUT; legs are ordered
# headline-first so a mid-run wedge still leaves the fps number.
#
# Usage: bash tools/bench_head.sh [outfile]
set -u
OUT="${1:-/tmp/bench_head.log}"
cd /root/repo
: > "$OUT"
log() { echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT"; }

log "bench.py batch 8 (headline fps)"
stdbuf -o0 timeout -k 30 900 python bench.py 2>&1 | tail -2 | tee -a "$OUT"

log "bench.py batch 16"
BENCH_BATCH=16 stdbuf -o0 timeout -k 30 900 python bench.py 2>&1 | tail -2 | tee -a "$OUT"

log "bench_train.py batch 2 (target-2 fitting step)"
stdbuf -o0 timeout -k 30 900 python tools/bench_train.py 2 2>&1 | tail -4 | tee -a "$OUT"

log "bench_train.py batch 4"
stdbuf -o0 timeout -k 30 900 python tools/bench_train.py 4 2>&1 | tail -4 | tee -a "$OUT"

log "bench_train.py batch 8 (r5: post-marcher-fix re-measure)"
stdbuf -o0 timeout -k 30 1200 python tools/bench_train.py 8 2>&1 | tail -4 | tee -a "$OUT"

log "bench_train.py batch 16"
stdbuf -o0 timeout -k 30 1200 python tools/bench_train.py 16 2>&1 | tail -4 | tee -a "$OUT"

log "bench_arcface.py 1M ids (bf16 conv path)"
stdbuf -o0 timeout -k 30 2000 python tools/bench_arcface.py 1000000 40 2>&1 | tail -4 | tee -a "$OUT"

log "bench_arcface.py 1M ids batch 512"
ARC_BATCH=512 stdbuf -o0 timeout -k 30 2000 python tools/bench_arcface.py 1000000 40 2>&1 | tail -4 | tee -a "$OUT"

log "done"
