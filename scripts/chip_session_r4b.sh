#!/bin/bash
# Round-4 chip evidence session, part B: the two steps that died with
# the part-A capture process (docs/CHIP_SESSION_r04.log ends mid step 5).
# Same rules as chip_session_r4.sh: sequential, timeout-bounded, abort
# on first failure, never concurrent with another TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r04.log

echo "running" > "$STATE"
note "=== chip session part B start, HEAD $HEAD_SHA ==="

# 5 (retry). sharded degenerate-mesh overhead (exact @1M, IVF @262k)
run_step sharded 5400 python scripts/sharded_bench.py

# 6. IVF serving-path bench for the record
run_step bench_ivf 3600 env BENCH_IMPL=ivf python bench.py

echo "done" > "$STATE"
note "=== chip session part B COMPLETE at HEAD $HEAD_SHA ==="
