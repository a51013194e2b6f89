#!/bin/bash
# Round-4 chip evidence session: run once, sequentially, on a live relay.
#
# Captures everything the round-3 verdict queued behind the relay outage
# (VERDICT.md "Next round" items 1, 4, 7) in ONE session so kernel
# timings stay comparable (int8 schedules vary between remote compile
# sessions — docs/ABLATION_INT8.md):
#   1. scripts/tpu_smoke.py    -> SMOKE_r04.txt (compiled parity at HEAD)
#   2. bench.py fast           -> headline QPS
#   3. bench.py int8 twice     -> cache-warm reproduction (verdict #7)
#   4. scripts/approx_ab_1m.py -> approx vs exact sort A/B + tail recall
#   5. scripts/sharded_bench.py-> degenerate-mesh overhead (verdict #4)
#
# Every step is timeout-bounded. On the FIRST failure the session aborts
# (a timed-out TPU process is a mid-op kill; stacking more on a wedged
# relay resets its recovery clock — see .claude/skills/verify/SKILL.md).
# The caller (chip_watch loop) retries the whole session later.
# Never run this concurrently with any other TPU-touching process.

. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r04.log

echo "running" > "$STATE"
note "=== chip session start, HEAD $HEAD_SHA ==="

# 1. compiled-mode kernel parity -> SMOKE_r04.txt
SMOKE_TMP=$(mktemp)
note "step smoke: start"
t0=$SECONDS
if timeout 3600 python scripts/tpu_smoke.py > "$SMOKE_TMP" 2>&1; then
  {
    echo "# HEAD: $HEAD_SHA"
    echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    cat "$SMOKE_TMP"
  } > "$REPO/SMOKE_r04.txt"
  cat "$SMOKE_TMP" >> "$LOG"
  note "step smoke: OK ($((SECONDS-t0))s) -> SMOKE_r04.txt"
else
  rc=$?
  cat "$SMOKE_TMP" >> "$LOG"
  note "step smoke: FAILED rc=$rc after $((SECONDS-t0))s — aborting session"
  echo "failed:smoke" > "$STATE"
  exit $rc
fi

# 2. headline bench (fast variant, persistent compile cache on)
run_step bench_fast 3600 python bench.py

# 3. int8 cache-warm reproduction: two runs in a row (second is the
#    cache-warm number the verdict asked to pin)
run_step bench_int8_prime 3600 env BENCH_IMPL=int8 python bench.py
run_step bench_int8_warm 1800 env BENCH_IMPL=int8 python bench.py

# 4. approx vs exact sort at candidate_k=500 @1M (batches 8 + 32)
run_step approx_ab 5400 python scripts/approx_ab_1m.py

# 5. sharded degenerate-mesh overhead (exact @1M, IVF @262k)
run_step sharded 5400 python scripts/sharded_bench.py

# 6. IVF serving-path bench for the record
run_step bench_ivf 3600 env BENCH_IMPL=ivf python bench.py

echo "done" > "$STATE"
note "=== chip session COMPLETE at HEAD $HEAD_SHA ==="
