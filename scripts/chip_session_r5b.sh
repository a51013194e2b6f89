#!/bin/bash
# Round-5 chip evidence session, part B: everything the round-4 verdict
# queued behind a live relay, at the round's final HEAD (after part A
# pinned the INT8_FEED auto default):
#   1. scripts/tpu_smoke.py          -> SMOKE_r05.txt (compiled parity)
#   2. bench.py twice (default tier) -> headline QPS, cache-warm pinned
#   3. load_test @1M --quantized     -> route-level numbers post approx
#                                       routing (verdict item 2)
#   4. load_test @1M --keyword       -> first real-chip hybrid-route row
#   5. BENCH_ROWS=4000000 fast       -> >=4M-row capacity bench row
#   6. BENCH_ROWS=3342336 int8       -> int8 tier at its own ceiling
#
# Same rules as scripts/chip_session_r4.sh: sequential, timeout-bounded,
# abort on first failure, never concurrent with any other TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part B start, HEAD $HEAD_SHA ==="

# 1. compiled-mode kernel parity -> SMOKE_r05.txt
SMOKE_TMP=$(mktemp)
note "step smoke: start"
t0=$SECONDS
if timeout 3600 python scripts/tpu_smoke.py > "$SMOKE_TMP" 2>&1; then
  {
    echo "# HEAD: $HEAD_SHA"
    echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    cat "$SMOKE_TMP"
  } > "$REPO/SMOKE_r05.txt"
  cat "$SMOKE_TMP" >> "$LOG"
  note "step smoke: OK ($((SECONDS-t0))s) -> SMOKE_r05.txt"
else
  rc=$?
  cat "$SMOKE_TMP" >> "$LOG"
  note "step smoke: FAILED rc=$rc after $((SECONDS-t0))s — aborting session"
  echo "failed:smoke" > "$STATE"
  exit $rc
fi

# 2. default-tier headline bench: prime, then the pinned cache-warm run
run_step bench_prime 3600 python bench.py
run_step bench_warm 1800 python bench.py

# 3. route-level load test @1M on the serving-default quantized tier
#    (verdict item 2: the 658ms/13.3QPS row predates round-4's approx
#    routing; candidate_k=500 now takes ApproxTopK on every path).
#    Same --threads 32 / 2000 requests as the round-4 row; --quantized
#    matches the STORE_QUANTIZED=auto serving default.
run_step load_plain 5400 python scripts/load_test.py --rows 1000000 \
  --threads 32 --requests 2000 --quantized

# 4. the hybrid keyword route, never before measured on the real chip
run_step load_keyword 5400 python scripts/load_test.py --rows 1000000 \
  --threads 32 --requests 1000 --quantized --keyword

# 5. capacity: >=4M rows on the bf16 recall-gold tier (12.3 GB resident,
#    under the 15.5 GB safety budget; int8 shadow would not fit at 4M —
#    docs/OPERATIONS.md capacity table)
run_step bench_4m 5400 env BENCH_ROWS=4000000 BENCH_IMPL=fast python bench.py

# 6. capacity: the int8 serving tier near its ~3.35M-row ceiling
#    (3145728 = 1536 * 2048 keeps shadow alignment and leaves room for
#    the chunked-quantize transient; the exact ceiling has no headroom
#    for the build-time f32 temp)
run_step bench_int8_3m 5400 env BENCH_ROWS=3145728 BENCH_IMPL=int8 python bench.py

echo "done" > "$STATE"
note "=== chip session r5 part B COMPLETE at HEAD $HEAD_SHA ==="
