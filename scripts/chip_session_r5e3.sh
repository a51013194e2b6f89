#!/bin/bash
# Round-5 chip evidence, part E3: one clean re-run of the hybrid load test.
# The part-E2 row (18.5 QPS) was captured while the CPU-side test suite was
# running on this host's single core (visible as the 475s keyword-corpus
# build vs the typical 325s); since the BM25 channel and fusion are
# host-CPU-bound, that row is contaminated-conservative. Nothing else runs
# during this capture.
. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part E3 start, HEAD $HEAD_SHA (clean-host hybrid re-run) ==="
run_step load_keyword_clean 5400 \
  python scripts/load_test.py --rows 1000000 --threads 32 --requests 1000 \
  --quantized --keyword
echo "done" > "$STATE"
note "=== chip session r5 part E3 COMPLETE ==="
