#!/usr/bin/env bash
# Stage-1 eval launcher. Usage: -c config -m model_ckpt [-w work_dir]
set -euo pipefail

CONFIG=""
MODEL=""
WORK_DIR="work_dir"

while getopts "c:m:w:" opt; do
  case $opt in
    c) CONFIG=$OPTARG ;;
    m) MODEL=$OPTARG ;;
    w) WORK_DIR=$OPTARG ;;
    *) echo "usage: $0 -c config -m model [-w work_dir]"; exit 1 ;;
  esac
done
[ -n "$CONFIG" ] || { echo "config required (-c)"; exit 1; }

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
ARGS=(--config "$CONFIG" --work_dir "$WORK_DIR")
[ -n "$MODEL" ] && ARGS+=(--load_from "$MODEL")
exec python "${REPO_ROOT}/scripts/eval.py" "${ARGS[@]}"
