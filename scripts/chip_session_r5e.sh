#!/bin/bash
# Round-5 chip evidence session, part E: final-HEAD re-pins after the
# round-5 keyword-channel work (block-major BM25 scorer pipeline e0cb9d1,
# AVX-512 walk 7598c74) landed AFTER parts B-D were captured:
#   1. scripts/tpu_smoke.py      -> SMOKE_r05.txt restamped at final HEAD
#   2. bench.py (default tier)   -> headline re-pin at final HEAD
#   3. load_test --keyword       -> hybrid route at final HEAD (the part-B
#                                   17.4 QPS row predates the 2.7x scorer)
#   4. BENCH_IMPL=ivf bench.py   -> IVF row re-pin (README still cites the
#                                   round-2 HEAD number)
#
# Same rules as parts B/C/D: sequential, timeout-bounded, abort on first
# failure, never concurrent with any other TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part E start, HEAD $HEAD_SHA ==="

# 1. compiled-mode kernel parity restamped at final HEAD
SMOKE_TMP=$(mktemp)
note "step smoke: start"
t0=$SECONDS
if timeout 3600 python scripts/tpu_smoke.py > "$SMOKE_TMP" 2>&1; then
  {
    echo "# HEAD: $HEAD_SHA"
    echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    cat "$SMOKE_TMP"
  } > "$REPO/SMOKE_r05.txt"
  note "step smoke: OK ($((SECONDS-t0))s) -> SMOKE_r05.txt"
else
  rc=$?
  tail -40 "$SMOKE_TMP" >> "$LOG"
  note "step smoke: FAILED rc=$rc after $((SECONDS-t0))s — aborting session"
  echo "failed:smoke" > "$STATE"
  exit "$rc"
fi

# 2. the driver's headline path at final HEAD
run_step bench_default 3600 python bench.py

# 3. hybrid two-channel route at final HEAD (fresh real-chip number with
#    the round-5 scorer pipeline in the BM25 channel)
run_step load_keyword 5400 python scripts/load_test.py \
  --rows 1000000 --threads 32 --requests 1000 --quantized --keyword

# 4. IVF latency re-pin (README row is from round-2 HEAD)
run_step bench_ivf 3600 env BENCH_IMPL=ivf python bench.py

echo "done" > "$STATE"
note "=== chip session r5 part E COMPLETE at HEAD $HEAD_SHA ==="
