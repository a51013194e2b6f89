#!/bin/bash
# Round-5 chip evidence session, part D: after the bench_4m OOM in part C
# (docs/CHIP_SESSION_r05.log) was fixed by in-place donated corpus
# assembly (253e6c4), this part re-runs:
#   1. default bench @1M      -> re-pin the headline under the new assembly
#   2. BENCH_ROWS=4000000 fast -> >=4M-row capacity bench row
#   3. BENCH_ROWS=3145728 int8 -> int8 tier near its ~3.35M-row ceiling
#
# Same rules as parts B/C: sequential, timeout-bounded, abort on first
# failure, never concurrent with any other TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part D start, HEAD $HEAD_SHA ==="

# 1. the driver's headline path, under the restructured corpus assembly
run_step bench_default 3600 python bench.py

# 2. capacity: >=4M rows on the bf16 recall-gold tier (12.3 GB resident)
run_step bench_4m 5400 env BENCH_ROWS=4000000 BENCH_IMPL=fast python bench.py

# 3. capacity: the int8 serving tier near its ~3.35M-row ceiling
run_step bench_int8_3m 5400 env BENCH_ROWS=3145728 BENCH_IMPL=int8 python bench.py

echo "done" > "$STATE"
note "=== chip session r5 part D COMPLETE at HEAD $HEAD_SHA ==="
