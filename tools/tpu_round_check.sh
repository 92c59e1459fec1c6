#!/bin/bash
# Full TPU measurement battery (run when the axon tunnel is healthy):
#   bash tools/tpu_round_check.sh [outdir]
# 1. bench.py             — headline reads/s (BENCH protocol)
# 2. profile_stages.py    — per-stage device timings
# 3. check_backend_golden — TPU == CPU byte identity on all golden cases
# 4. soak_concordant.py   — concordant-workload throughput
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_round_check}
mkdir -p "$OUT"

echo "== bench =="
timeout 2400 python bench.py 2>&1 | tee "$OUT/bench.txt"

echo "== stage profile =="
timeout 1200 python tools/profile_stages.py 32 2048 2>&1 \
    | tee "$OUT/stages.txt"

echo "== backend golden identity =="
timeout 2400 python tools/check_backend_golden.py 2>&1 \
    | tee "$OUT/backend_golden.txt"

echo "== concordant soak =="
timeout 1200 python tools/soak_concordant.py --zmws 100 --passes 4 2>&1 \
    | tee "$OUT/concordant.txt"

echo "done -> $OUT"
