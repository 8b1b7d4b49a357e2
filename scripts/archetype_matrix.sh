#!/bin/bash
# Serve-default decision matrix on ONE archetype scene (VERDICT r4 #1):
# re-earn every serve default where the benchmark can actually say no.
#
#   bash scripts/archetype_matrix.sh <scene> [rundir]
#
# Expects a trained run (scripts/train_synth_gen.sh with SCENE=<scene>).
# Writes JSON lines to runs/logs/matrix_<scene>.jsonl; each line is one
# cli/serve.py measurement (fenced) at 64 distinct held-out views
# (seed 99, disjoint from the 512 training views at seed 3).
set -e
cd "$(dirname "$0")/.."
SCENE=${1:?scene}
OUT=${2:-runs/synth_$SCENE}
LOG=runs/logs/matrix_${SCENE}.jsonl
: > "$LOG"

serve() {
  echo "=== serve $* ===" >&2
  timeout 900 python -m dsac_tpu.cli.serve --synthetic 64 --seed 99 \
    --scene "$SCENE" --out "$OUT" --batch 8 --queue 8 "$@" 2>/dev/null \
    | grep '"metric"' | tee -a "$LOG"
}

# the current bench defaults (score CNN, attempts 4, verify_topk 4)
serve --verify-topk 4 --attempts 4
# scoring head: trained score CNN vs fused soft-inlier
serve --verify-topk 4 --attempts 4 --fused-scoring
# attempts sweep at the default head
serve --verify-topk 4 --attempts 16
serve --verify-topk 4 --attempts 1
# verified selection off
serve --verify-topk 0 --attempts 4
# two-phase sampling at full 16-attempt robustness
serve --verify-topk 4 --attempts 16 --two-phase-sampling

# rdraw decision (DSAC softmax draw vs argmax) on the eval path — writes
# the reference error files into $OUT
tr() {
  echo "=== test_ransac $* ===" >&2
  timeout 900 python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed 99 \
    --scene "$SCENE" --out "$OUT" --model endtoend --fused-refine "$@" \
    2>/dev/null | tail -2
}
tr -rdraw 0
tr -rdraw 1
echo "matrix done -> $LOG" >&2
