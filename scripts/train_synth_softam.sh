#!/bin/bash
# SoftAM training recipe (the DSAC run's twin, VERDICT item 7): trains the
# soft-argmax variant end-to-end on the synthetic scene and evaluates it
# on the disjoint 24-view split, producing runs/synth_softam.
#
# Reference: train_ransac_softam.cpp (E2E) + test_ransac_softam.cpp
# (eval); the softmax weights AVERAGE the hypothesis pool and only the
# averaged pose is refined (core/cnn_softam.h:1082-1154).
#
# Reuses the pretrained obj/score init snapshots from the DSAC flagship
# run (the reference shares them too: both variants load
# obj_model_init/score_model_init) — run scripts/train_synth_gen.sh first.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-runs/synth_softam}
PRETRAIN=${PRETRAIN:-runs/synth_gen_fast}
TRAIN_SEED=3
EVAL_SEED=99
VIEWS=${VIEWS:-512}

mkdir -p "$OUT"
for name in obj_model_init score_model_init; do
    if [ ! -e "$OUT/$name" ]; then
        cp -r "$PRETRAIN/$name" "$OUT/$name"
    fi
done

python -m dsac_tpu.cli.train_ransac_softam --synthetic $VIEWS \
    --seed $TRAIN_SEED --training-rounds ${E2E_ROUNDS:-5000} \
    --steps-per-call 100 --out $OUT
echo "=== eval: softam end-to-end ==="
python -m dsac_tpu.cli.test_ransac_softam --synthetic 24 --seed $EVAL_SEED \
    --model endtoend --out $OUT -rdraw 0 | tail -4
