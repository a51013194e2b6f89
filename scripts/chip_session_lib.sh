# Shared plumbing for the chip-evidence session scripts
# (scripts/chip_session_r*.sh).  Source it with the session log name:
#
#   . "$(dirname "$0")/chip_session_lib.sh" CHIP_SESSION_r05.log
#
# Provides:
#   REPO / LOG / STATE / HEAD_SHA  — session constants
#   note <msg>                     — timestamped line to stdout + $LOG
#   run_step <name> <timeout_s> <cmd...>
#       — timeout-bounded step appended to $LOG; on failure writes
#         "failed:<name>" to the watch state file and exits, so the
#         relay watch loop (and the driver) see the abort.
#
# One copy, sourced by every session script: a round-5 review pass found
# this block copy-pasted eight times and drifting.

set -u
cd "$(dirname "${BASH_SOURCE[1]}")/.."
REPO="$PWD"
LOG="$REPO/docs/${1:?usage: . chip_session_lib.sh <logname>}"
STATE="/tmp/chip_watch.state"
HEAD_SHA=$(git rev-parse HEAD)

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

run_step() { # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  note "step $name: start ($*)"
  local t0=$SECONDS
  if timeout "$tmo" "$@" >> "$LOG" 2>&1; then
    note "step $name: OK ($((SECONDS-t0))s)"
    return 0
  fi
  local rc=$?
  note "step $name: FAILED rc=$rc after $((SECONDS-t0))s — aborting session"
  echo "failed:$name" > "$STATE"
  exit "$rc"
}
