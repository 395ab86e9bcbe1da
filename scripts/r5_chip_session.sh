#!/bin/bash
# Round-5 chip measurement session: runs the remaining VERDICT items
# sequentially (one chip — jobs must not overlap), each under its own
# timeout, appending progressive JSON to per-job logs in $OUT (default
# /tmp). Safe to re-run: the persistent compile cache makes repeats
# cheap. Usage: bash scripts/r5_chip_session.sh [outdir]
set -u
OUT="${1:-/tmp}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/r5_session.log"
  timeout "$tmo" "$@" >> "$OUT/r5_$name.log" 2>&1
  echo "== $name rc=$?" | tee -a "$OUT/r5_session.log"
}

# 1) NUTS n=8192 honest row (conservative envelope: 2-chain programs,
#    3-transition segments) — VERDICT #1c
run nuts8k 7200 env FRIEDRICH_MCMC_DEBUG=1 python scripts/measure.py nuts \
    --gp-n 8192 --precision f32 --chains 4 --chain-batch 2 \
    --scan-segment 3 --warmup 50 --samples 50

# 2) mapfit/polish study at n=50k, s in {10k, 20k} — VERDICT #3
run mapfit50k 7200 python scripts/mapfit_study.py --n 50000 \
    --sizes 10000 20000 --map-steps 120 --polish-steps 40

# 3) bf16 vs f32 predict isolation at n=50k — VERDICT #5
run predict_f32 2400 python scripts/measure.py predict --n 50000 \
    --storage none
run predict_bf16 2400 python scripts/measure.py predict --n 50000 \
    --storage bf16 --noise 2.0

# 4) mapfit at n=10k full-data (map vs adam wall-clock/LML) — VERDICT #3
run mapfit10k 3600 python scripts/mapfit_study.py --n 10000 \
    --sizes 10000 --map-steps 120 --polish-steps 40

# 5) f32x3+eps NUTS rung at n=4096 (crash-prone config LAST before the
#    long job; conservative segments) — VERDICT #7
run nuts_f32x3eps 5400 python scripts/measure.py nuts --gp-n 4096 \
    --precision f32x3 --eps 0.125 --chains 8 --chain-batch 4 \
    --scan-segment 5 --warmup 100 --samples 100

# 6) headline bench (driver metric sanity)
run bench 3600 python bench.py

echo "session done" | tee -a "$OUT/r5_session.log"
