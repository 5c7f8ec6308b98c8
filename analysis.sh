#!/usr/bin/env bash
# 6-step interpretability analysis over a trained run (reference analysis.sh).
# usage: ./analysis.sh RUN_ID VAL_NPZ [RUN_ROOT]

set -euo pipefail
cd "$(dirname "$0")"

RUN_ID="${1:?usage: ./analysis.sh RUN_ID VAL_NPZ [RUN_ROOT]}"
VAL_NPZ="${2:?usage: ./analysis.sh RUN_ID VAL_NPZ [RUN_ROOT]}"
RUN_ROOT="${3:-runs}"

python -u scripts/run_analysis.py "$RUN_ID" --val_npz "$VAL_NPZ" --run_root "$RUN_ROOT"
echo "[analysis] charts → $RUN_ROOT/$RUN_ID/charts, tables → $RUN_ROOT/$RUN_ID/tables"
