#!/bin/bash
# Round-5 chip evidence session, part E2: resume the two part-E steps that
# were killed mid-run by a harness restart (see CHIP_SESSION_r05.log):
#   3. load_test --keyword       -> hybrid route at final HEAD (the part-B
#                                   17.4 QPS row predates the 2.7x scorer)
#   4. BENCH_IMPL=ivf bench.py   -> IVF row re-pin (README still cites the
#                                   round-2 HEAD number)
#
# Same rules as parts B-E: sequential, timeout-bounded, abort on first
# failure, never concurrent with any other TPU process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part E2 start, HEAD $HEAD_SHA ==="

# 3. hybrid two-channel route at final HEAD (fresh real-chip number with
#    the round-5 scorer pipeline in the BM25 channel)
run_step load_keyword 5400 python scripts/load_test.py \
  --rows 1000000 --threads 32 --requests 1000 --quantized --keyword

# 4. IVF latency re-pin (README row is from round-2 HEAD)
run_step bench_ivf 3600 env BENCH_IMPL=ivf python bench.py

echo "done" > "$STATE"
note "=== chip session r5 part E2 COMPLETE at HEAD $HEAD_SHA ==="
