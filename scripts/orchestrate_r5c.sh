#!/bin/bash
# Round-5c: SUPERSEDES orchestrate_r5b (same OUT dir; every stage
# resumes from its orbax snapshot, so the 60k pretrain budget only
# bites if r5b stopped below 60k — it did, at ~16k).
# Question: can a wider receptive field break the repeat ambiguity?
# The repeat archetype's texture period projects to ~105 px; the
# flagship dense net's ~50 px RF regresses coordinates only mod the
# period (held-out L1 0.34 m).  dense_ctx adds a residual dilated
# stack (RF ~530 px).  Pipeline: pretrain on repeat -> init eval with
# the soft-inlier head -> tempered soft-head e2e with best-checkpoint
# selection (the round-5 recipe).
cd /root/repo
LOG=runs/logs
mkdir -p $LOG

WATCHDOG_TAG=orch5c
source "$(dirname "$0")/lib_watchdog.sh"

OUT=runs/synth_repeat_ctx
EVAL="python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed 99 --arch dense_ctx --scene repeat --fused-refine -rdraw 0 --out $OUT"

watchdog_run ctx_pretrain env python -m dsac_tpu.cli.train_obj \
    --synthetic 512 --seed 3 --arch dense_ctx --scene repeat \
    --updates 60000 --dense-batch 2 --steps-per-call 50 \
    --validate-every 10000 --out $OUT
watchdog_run ctx_init_eval env timeout 1500 $EVAL --model init --fused-scoring
watchdog_run ctx_e2e env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --arch dense_ctx --scene repeat \
    --training-rounds 2000 --steps-per-call 100 --refine-mode implicit \
    --score-head soft --score-temp 10 --validate-every 200 \
    --validate-frames 12 --out $OUT
watchdog_run ctx_best_eval env timeout 1500 $EVAL --model best --fused-scoring
echo "[orch5c] complete at $(date)"
