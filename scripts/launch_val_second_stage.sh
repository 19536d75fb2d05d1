#!/usr/bin/env bash
# CORAL stage-2 eval launcher.
# Usage: -c config -m baseline_ckpt -r refiner_ckpt [-w work_dir]
set -euo pipefail

CONFIG=""
MODEL=""
REFINER=""
WORK_DIR="work_dir"

while getopts "c:m:r:w:" opt; do
  case $opt in
    c) CONFIG=$OPTARG ;;
    m) MODEL=$OPTARG ;;
    r) REFINER=$OPTARG ;;
    w) WORK_DIR=$OPTARG ;;
    *) echo "usage: $0 -c config -m baseline -r refiner [-w work_dir]"; exit 1 ;;
  esac
done
[ -n "$CONFIG" ] || { echo "config required (-c)"; exit 1; }

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
ARGS=(--config "$CONFIG" --work_dir "$WORK_DIR")
[ -n "$MODEL" ] && ARGS+=(--load_from "$MODEL")
[ -n "$REFINER" ] && ARGS+=(--refiner_path "$REFINER")
exec python "${REPO_ROOT}/scripts/LTeval.py" "${ARGS[@]}"
