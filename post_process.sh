#!/usr/bin/env bash
# Post-process only: collect artifacts and organize run outputs under
# runs/<RUN_ID> (parity: reference post_process.sh).
# Usage: ./post_process.sh RUN_ID VAL_NPZ [RUN_ROOT]

set -euo pipefail
cd "$(dirname "$0")"

if [[ $# -lt 2 || $# -gt 3 ]]; then
  echo "Usage: $0 RUN_ID VAL_NPZ [RUN_ROOT]" >&2
  exit 1
fi

RUN_ID="$1"
VAL_NPZ="$2"
RUN_ROOT="${3:-runs}"
RUN_DIR="$RUN_ROOT/$RUN_ID"

python scripts/collect_artifacts_yaml.py "$RUN_ID" --npz "$VAL_NPZ" \
  --run_root "$RUN_ROOT"

# Copy mutation scores into the run dir if present so summarizers find them
SCORES_FILE="$RUN_DIR/scores/one_cds__best.tsv"
if [[ -f "$SCORES_FILE" ]]; then
  mkdir -p "$RUN_DIR/tables"
  cp "$SCORES_FILE" "$RUN_DIR/tables/one_cds__best.tsv"
fi

python scripts/export_run_summary.py "$RUN_ID" --run_root "$RUN_ROOT"

echo "[post-process] Collected artifacts for ${RUN_ID} into ${RUN_DIR}"
