#!/bin/bash
# Relay watch loop: single bounded probe every 20 min (the verify-skill
# wedge protocol: a timed-out probe is itself a mid-op kill and resets
# the relay's recovery clock, so probes must be single and >=15 min
# apart).  On the first successful probe, runs the full round-4 chip
# evidence session (scripts/chip_session_r4.sh) and exits.
#
# State in /tmp/chip_watch.state: probing | running | done | failed:<step>
# PID in /tmp/chip_watch.pid (kill $(cat /tmp/chip_watch.pid) to stop —
# NEVER pkill by pattern).

set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/chip_watch.pid
STATE="/tmp/chip_watch.state"
PROBE_LOG="/tmp/chip_probe.log"

while true; do
  echo "probing" > "$STATE"
  echo "[$(date -u +%H:%M:%S)] probe" >> "$PROBE_LOG"
  if timeout 150 python -c "import jax; d=jax.devices(); print('up:', d)" \
      >> "$PROBE_LOG" 2>&1; then
    echo "[$(date -u +%H:%M:%S)] relay UP — starting chip session" >> "$PROBE_LOG"
    bash scripts/chip_session_r4.sh
    rc=$?
    if [ "$rc" -eq 0 ]; then
      exit 0
    fi
    # session aborted mid-way (wedge?) — long cool-down, then retry
    echo "[$(date -u +%H:%M:%S)] session failed rc=$rc; cooling down 35 min" \
      >> "$PROBE_LOG"
    sleep 2100
  else
    echo "[$(date -u +%H:%M:%S)] relay still down" >> "$PROBE_LOG"
    sleep 1200
  fi
done
