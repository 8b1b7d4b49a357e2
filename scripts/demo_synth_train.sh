#!/bin/bash
# End-to-end training demonstration on the procedural synthetic scene:
# coordinate-CNN pretraining -> score-CNN pretraining -> e2e DSAC ->
# evaluation. Writes checkpoints/logs/results under runs/synth_demo.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-runs/synth_demo}
FRAMES=${FRAMES:-48}
python -m dsac_tpu.cli.train_obj --synthetic $FRAMES --rounds ${OBJ_UPDATES:-1500} \
    --out $OUT --seed 3
python -m dsac_tpu.cli.train_score --synthetic $FRAMES --rounds ${SCORE_ROUNDS:-12} \
    --out $OUT --seed 4
python -m dsac_tpu.cli.test_ransac --synthetic 16 --model init --out $OUT \
    --seed 99 -rdraw 0 | tail -3
python -m dsac_tpu.cli.train_ransac --synthetic $FRAMES --rounds ${E2E_ROUNDS:-150} \
    --out $OUT --seed 5
python -m dsac_tpu.cli.test_ransac --synthetic 16 --model endtoend --out $OUT \
    --seed 99 -rdraw 0 | tail -3
