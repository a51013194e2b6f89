#!/bin/bash
# Round-5 chip evidence, part G: IVF bench re-pin after the
# build_on_device int8_feed fix — the part-E2 9,877-QPS row predates the
# feed-pinning commit that (transiently) broke and then fixed this exact
# path, so the published number must be re-proven at the fixed HEAD.
. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part G start, HEAD $HEAD_SHA (IVF re-pin post feed fix) ==="
run_step bench_ivf 3600 env BENCH_IMPL=ivf python bench.py
echo "done" > "$STATE"
note "=== chip session r5 part G COMPLETE at HEAD $HEAD_SHA ==="
