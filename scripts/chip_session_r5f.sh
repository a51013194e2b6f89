#!/bin/bash
# Round-5 chip evidence, part F: restamp after the post-review fixes
# (capacity-charged installs e276140, tie-key interleave 60c1998, IVF
# feed pinned as a jit-static arg 79b5a56 — a kernel-path change, so the
# compiled-mode smoke must re-prove parity at this HEAD):
#   1. scripts/tpu_smoke.py -> SMOKE_r05.txt restamped
#   2. bench.py             -> headline re-pin (confirms the serving
#                              default still routes int8 after the
#                              resolve_store_quantized(None) fix)
. "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log

echo "running" > "$STATE"
note "=== chip session r5 part F start, HEAD $HEAD_SHA (post-review-fix restamp) ==="

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

run_step bench_default 3600 python bench.py

echo "done" > "$STATE"
note "=== chip session r5 part F COMPLETE at HEAD $HEAD_SHA ==="
