#!/bin/bash
# Round-5b: can a wider receptive field break the repeat ambiguity?
# The repeat archetype's texture period projects to ~105 px; the
# flagship dense net's ~50 px RF regresses coordinates only mod the
# period (held-out L1 0.34 m).  dense_ctx adds a residual dilated
# stack (RF ~530 px).  Pipeline: pretrain on repeat -> init eval with
# the soft-inlier head -> tempered soft-head e2e with best-checkpoint
# selection (the round-5 recipe).
cd /root/repo
LOG=runs/logs
mkdir -p $LOG

watchdog_run() {
  local name=$1; shift
  local log=$LOG/${name}_orch.log
  local rc attempt
  for attempt in 1 2 3 4; do
    echo "[orch5c] $(date +%H:%M) $name attempt $attempt"
    setsid "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 120
      if [ $(( $(date +%s) - $(stat -c %Y "$log") )) -gt 1500 ]; then
        echo "[orch5c] $(date +%H:%M) $name HANG; killing group $pid"
        kill -- -$pid 2>/dev/null; sleep 5; kill -9 -- -$pid 2>/dev/null
      fi
    done
    wait $pid; rc=$?
    echo "[orch5c] $(date +%H:%M) $name attempt $attempt rc=$rc"
    [ $rc -eq 0 ] && return 0
    sleep 10
  done
  echo "[orch5c] $name FAILED after 4 attempts"
  return 1
}

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
