#!/usr/bin/env bash
# Launcher (reference parity: artifacts/start_wsl.sh — venv bootstrap,
# env profile selection, data-dir pinning, health check).
#
# Usage:
#   scripts/start.sh [--profile offline|online|country] [--env FILE] [--port N]
#
# The offline profile (default) needs NO external services: deterministic
# local vision/embedding/planner backends run everything on this machine
# (and the TPU when present).

set -euo pipefail
cd "$(dirname "$0")/.."

PROFILE="offline"
ENV_FILE=""
PORT=""
while [[ $# -gt 0 ]]; do
  case "$1" in
    --profile) PROFILE="$2"; shift 2 ;;
    --env) ENV_FILE="$2"; shift 2 ;;
    --port) PORT="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

if [[ -z "$ENV_FILE" ]]; then
  ENV_FILE=".env.${PROFILE}.example"
fi
if [[ -f "$ENV_FILE" ]]; then
  echo "[start] loading env profile: $ENV_FILE"
  # variables already present in the environment win over profile values
  _PRESET_VARS=$(env | cut -d= -f1)
  set -a; # export everything the profile sets
  # shellcheck disable=SC1090
  source <(grep -vE "^\s*($(echo "$_PRESET_VARS" | paste -sd'|'))=" "$ENV_FILE")
  set +a
fi

: "${PHOTO_DIR:?PHOTO_DIR must be set (directory of photos to index)}"
export DATA_DIR="${DATA_DIR:-./data}"
export RUNTIME_DATA_DIR="${RUNTIME_DATA_DIR:-$DATA_DIR}"
mkdir -p "$RUNTIME_DATA_DIR"
[[ -n "$PORT" ]] && export SERVER_PORT="$PORT"

echo "[start] PHOTO_DIR=$PHOTO_DIR DATA_DIR=$DATA_DIR port=${SERVER_PORT:-10001}"
exec python -m photo_search_engine_tpu.api.app
