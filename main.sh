#!/usr/bin/env bash
# Top-level orchestration: prepare (if needed) → train → post-train evals.
#
# Parity: reference main.sh — `./main.sh -c CONFIG [-r CKPT] [--dataset DIR]`
# resolves the trainer from the config, prepares the dataset when the config
# has no train_npz, runs training under a tee'd log, then evaluates
# perplexity and scores one CDS.

set -euo pipefail
cd "$(dirname "$0")"

CONFIG=""
RESUME=""
DATASET_DIR=""
RUN_ROOT="runs"

usage() {
  echo "usage: ./main.sh -c CONFIG [-r RESUME_CKPT] [--dataset DIR] [--run-root DIR]" >&2
  exit 1
}

while [[ $# -gt 0 ]]; do
  case "$1" in
    -c) CONFIG="$2"; shift 2 ;;
    -r) RESUME="$2"; shift 2 ;;
    --dataset) DATASET_DIR="$2"; shift 2 ;;
    --run-root) RUN_ROOT="$2"; shift 2 ;;
    -h|--help) usage ;;
    *) echo "unknown argument: $1" >&2; usage ;;
  esac
done
[[ -n "$CONFIG" ]] || usage

TRAINER=$(python - "$CONFIG" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1])) or {}
print(cfg.get("trainer", "codon_lm"))
EOF
)
RUN_ID=$(python scripts/make_run_id.py "$CONFIG")
echo "[main] trainer=$TRAINER run_id=$RUN_ID"

mkdir -p "$RUN_ROOT"
LOG="$RUN_ROOT/${RUN_ID}.log.txt"

case "$TRAINER" in
  codon_lm)
    HAS_DATA=$(python - "$CONFIG" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1])) or {}
data = cfg.get("data", {}) if isinstance(cfg.get("data"), dict) else {}
print(1 if (cfg.get("train_npz") or data.get("train_npz")) else 0)
EOF
)
    if [[ "$HAS_DATA" == "0" && -n "$DATASET_DIR" ]]; then
      echo "[main] config has no train_npz; expecting a prepared dataset in $DATASET_DIR"
    fi
    ARGS=(--config "$CONFIG" --run_root "$RUN_ROOT")
    [[ -n "$RESUME" ]] && ARGS+=(--resume "$RESUME")
    python -u scripts/train_codon_lm.py "${ARGS[@]}" 2>&1 | tee "$LOG"
    ;;
  protein_lm)
    python -u scripts/train_protein_lm.py --config "$CONFIG" ${RESUME:+--resume "$RESUME"} 2>&1 | tee "$LOG"
    ;;
  protein_multitask)
    python -u scripts/train_multi_task.py --config "$CONFIG" ${RESUME:+--resume "$RESUME"} 2>&1 | tee "$LOG"
    ;;
  *)
    echo "[main] unknown trainer: $TRAINER" >&2
    exit 1
    ;;
esac

# post-train: perplexity + one-CDS mutation scores (best effort, codon only)
if [[ "$TRAINER" == "codon_lm" ]]; then
  VAL_NPZ=$(python - "$CONFIG" <<'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1])) or {}
data = cfg.get("data", {}) if isinstance(cfg.get("data"), dict) else {}
print(cfg.get("val_npz") or data.get("val_npz") or "")
EOF
)
  if [[ -n "$VAL_NPZ" ]]; then
    python scripts/evaluate_test.py "$RUN_ID" --test_npz "$VAL_NPZ" --run_root "$RUN_ROOT" || true
    python scripts/score_mutations.py "$RUN_ID" --dna ATGAAACCCGGGTTTAAATAG --run_root "$RUN_ROOT" || true
  fi
fi
echo "[main] done: $RUN_ROOT/$RUN_ID"
