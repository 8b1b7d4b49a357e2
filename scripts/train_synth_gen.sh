#!/bin/bash
# Flagship training recipe: reproduces runs/synth_gen_fast (the artifacts
# BASELINE.md's round-2 accuracy rows and bench.py's trained-weights serve
# path rely on).
#
#   - 512 procedural training viewpoints (seed 3), disjoint 24-view eval
#     (seed 99) of the same scene: the synthetic stand-in for a 7-Scenes
#     train/test split (no dataset egress on this box).
#   - coord-CNN pretrain: 150k updates (reference trains 300k,
#     train_obj.cpp:203; the dense FCN converges by 150k here).
#   - score-CNN pretrain: 80 rounds (train_score.cpp:269).
#   - e2e DSAC: the reference's FULL 5000-round budget
#     (train_ransac.cpp:50), implicit refine gradients, 100 rounds fused
#     per dispatch (~18 min on one TPU v5e chip).
#
# Total ~1h on one chip. Resumable: every stage restores its latest
# snapshot from $OUT.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-runs/synth_gen_fast}
ARCH=${ARCH:-dense}   # dense | dense_s2d (fast TPU stem) | patch
SCENE=${SCENE:-room}  # benchmark archetype (data/synthetic.py:ARCHETYPES)
TRAIN_SEED=3
EVAL_SEED=99
VIEWS=${VIEWS:-512}

python -m dsac_tpu.cli.train_obj --synthetic $VIEWS --seed $TRAIN_SEED \
    --arch $ARCH --scene $SCENE \
    --updates ${OBJ_UPDATES:-150000} --dense-batch 2 --steps-per-call 50 \
    --validate-every 10000 --out $OUT
python -m dsac_tpu.cli.train_score --synthetic $VIEWS --seed $TRAIN_SEED \
    --arch $ARCH --scene $SCENE --training-rounds ${SCORE_ROUNDS:-80} --out $OUT
echo "=== eval: pretrained only ==="
python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed $EVAL_SEED \
    --arch $ARCH --scene $SCENE --model init --out $OUT -rdraw 0 --fused-refine | tail -4
python -m dsac_tpu.cli.train_ransac --synthetic $VIEWS --seed $TRAIN_SEED \
    --arch $ARCH --scene $SCENE --training-rounds ${E2E_ROUNDS:-5000} --steps-per-call 100 \
    --refine-mode implicit --out $OUT
echo "=== eval: end-to-end ==="
python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed $EVAL_SEED \
    --arch $ARCH --scene $SCENE --model endtoend --out $OUT -rdraw 0 --fused-refine | tail -4
