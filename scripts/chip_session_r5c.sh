#!/bin/bash
# Round-5 chip evidence session, part C: resume of part B after the
# harness interrupted it mid-step. Part B completed smoke, bench_prime,
# bench_warm, and load_plain (docs/CHIP_SESSION_r05.log); this script
# re-runs the interrupted step and the two capacity rows that never
# started:
#   4. load_test @1M --keyword       -> first real-chip hybrid-route row
#   5. BENCH_ROWS=4000000 fast       -> >=4M-row capacity bench row
#   6. BENCH_ROWS=3145728 int8       -> int8 tier near its ceiling
#
# Same rules as scripts/chip_session_r4.sh: sequential, timeout-bounded,
# abort on first failure, never concurrent with any other TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part C start (resume), HEAD $HEAD_SHA ==="

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
note "=== chip session r5 part C COMPLETE at HEAD $HEAD_SHA ==="
