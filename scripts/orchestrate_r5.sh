#!/bin/bash
# Round-5 TPU campaign with the r4 hang watchdog (axon tunnel hangs a
# step ~1-2x per 2h; every stage resumes from its orbax snapshot, so
# recovery = kill the exact process group, relaunch).
#
# Stages (VERDICT r4 #2 and #3):
#   A. repeat archetype, tempered soft-head e2e (--score-temp 10: probed
#      training-softmax entropy 2.75 bits vs the collapsed 0.002 of the
#      untempered negative result) + a temp-40 twin (entropy 5.5) for a
#      temperature-response curve.
#   B. clutter archetype, score-CNN e2e with the supervised anchor
#      (--score-anchor): L1 to the pretrain labels on each round's own
#      pool, countering decoy-label drift. W=4 and W=20 twins.
#   C. benches: stamped latency evidence, kernel check, final headline.
cd /root/repo
LOG=runs/logs
mkdir -p $LOG

WATCHDOG_TAG=orch
source "$(dirname "$0")/lib_watchdog.sh"

seed_init() {  # $1 = src run dir, $2 = dst run dir, $3... = ckpt names
  local src=$1 dst=$2; shift 2
  mkdir -p "$dst"
  for n in "$@"; do
    [ -e "$dst/$n" ] || cp -r "$src/$n" "$dst/$n"
  done
}

EVAL="python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed 99 --fused-refine -rdraw 0"

# ---- stage A: repeat, tempered soft head --------------------------------
seed_init runs/synth_repeat runs/synth_repeat_soft_t10 obj_model_init
watchdog_run repeat_t10 env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene repeat --training-rounds 5000 \
    --steps-per-call 100 --refine-mode implicit --score-head soft \
    --score-temp 10 --validate-every 250  --out runs/synth_repeat_soft_t10
watchdog_run repeat_t10_eval env timeout 1500 $EVAL --scene repeat \
    --model endtoend --fused-scoring --out runs/synth_repeat_soft_t10
watchdog_run repeat_init_fs env timeout 1500 $EVAL --scene repeat \
    --model init --fused-scoring --out runs/synth_repeat
echo "[orch] stage A (t10) done $(date +%H:%M)"

# ---- stage B: clutter, anchored score CNN -------------------------------
seed_init runs/synth_clutter runs/synth_clutter_anchor4 obj_model_init score_model_init
watchdog_run clutter_a4 env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene clutter --training-rounds 5000 \
    --steps-per-call 100 --refine-mode implicit --score-anchor 4 \
    --validate-every 250  --out runs/synth_clutter_anchor4
watchdog_run clutter_a4_eval env timeout 1500 $EVAL --scene clutter \
    --model endtoend --out runs/synth_clutter_anchor4
echo "[orch] stage B (W=4) done $(date +%H:%M)"

# ---- stage A2/B2: response-curve twins ----------------------------------
seed_init runs/synth_repeat runs/synth_repeat_soft_t40 obj_model_init
watchdog_run repeat_t40 env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene repeat --training-rounds 5000 \
    --steps-per-call 100 --refine-mode implicit --score-head soft \
    --score-temp 40 --validate-every 250  --out runs/synth_repeat_soft_t40
watchdog_run repeat_t40_eval env timeout 1500 $EVAL --scene repeat \
    --model endtoend --fused-scoring --out runs/synth_repeat_soft_t40

seed_init runs/synth_clutter runs/synth_clutter_anchor20 obj_model_init score_model_init
watchdog_run clutter_a20 env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene clutter --training-rounds 5000 \
    --steps-per-call 100 --refine-mode implicit --score-anchor 20 \
    --validate-every 250  --out runs/synth_clutter_anchor20
watchdog_run clutter_a20_eval env timeout 1500 $EVAL --scene clutter \
    --model endtoend --out runs/synth_clutter_anchor20
echo "[orch] stage A2/B2 done $(date +%H:%M)"

# ---- stage C: benches ----------------------------------------------------
watchdog_run bench_latency env timeout 1200 python bench.py --latency
watchdog_run kernel_check env timeout 900 python scripts/tpu_kernel_check.py
watchdog_run bench_final env timeout 900 python bench.py --medians
echo "[orch] campaign complete at $(date)"

# ---- appended: validation-selected (best-checkpoint) recovery stages ----
# t10 training improved for ~600 rounds then degraded (valid-pool
# collapse); rerun with fine validation cadence + eval the *_best model.
seed_init runs/synth_repeat runs/synth_repeat_soft_t10b obj_model_init
watchdog_run repeat_t10b env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene repeat --training-rounds 2000 \
    --steps-per-call 100 --refine-mode implicit --score-head soft \
    --score-temp 10 --validate-every 200 --validate-frames 12 \
    --out runs/synth_repeat_soft_t10b
watchdog_run repeat_t10b_eval env timeout 1500 $EVAL --scene repeat \
    --model best --fused-scoring --out runs/synth_repeat_soft_t10b
watchdog_run clutter_a4_best_eval env timeout 1500 $EVAL --scene clutter \
    --model best --out runs/synth_clutter_anchor4
watchdog_run clutter_a20_best_eval env timeout 1500 $EVAL --scene clutter \
    --model best --out runs/synth_clutter_anchor20
echo "[orch] appended best-model stages complete at $(date)"

# ---- appended: H=4096 refine-all e2e-step timing (fused-VJP evidence) ----
watchdog_run e2e_step_h4096 env timeout 2400 python scripts/bench_e2e_step.py --hyps 4096 implicit
watchdog_run e2e_step_h256 env timeout 2400 python scripts/bench_e2e_step.py implicit unroll
echo "[orch] appended e2e-step timing complete at $(date)"

# ---- appended: clutter coord-only e2e + serve-default-head evals --------
# Diagnosis: clutter e2e degradation is score-CNN drift (entropy
# collapse even under the W=4/20 anchors). Coord-only training (soft
# head) cannot touch the score CNN; eval pairs the trained coords with
# the INIT score CNN (the parity path) and with the serve-default
# soft-inlier head.
seed_init runs/synth_clutter runs/synth_clutter_soft obj_model_init score_model_init
watchdog_run clutter_soft env python -m dsac_tpu.cli.train_ransac \
    --synthetic 512 --seed 3 --scene clutter --training-rounds 5000 \
    --steps-per-call 100 --refine-mode implicit --score-head soft \
    --score-temp 10 --validate-every 250 --validate-frames 12 \
    --out runs/synth_clutter_soft
watchdog_run clutter_soft_scnn_eval env timeout 1500 $EVAL --scene clutter \
    --model best -smodel score_model_init --out runs/synth_clutter_soft
watchdog_run clutter_soft_fs_eval env timeout 1500 $EVAL --scene clutter \
    --model best --fused-scoring --out runs/synth_clutter_soft
# serve-default (soft-inlier) evals of the existing e2e checkpoints
watchdog_run clutter_e2e_fs_eval env timeout 1500 $EVAL --scene clutter \
    --model endtoend --fused-scoring --out runs/synth_clutter
watchdog_run clutter_init_fs_eval env timeout 1500 $EVAL --scene clutter \
    --model init --fused-scoring --out runs/synth_clutter
echo "[orch] appended clutter coord-only stages complete at $(date)"

# ---- appended: repeat best-model consensus probe ------------------------
watchdog_run repeat_t10b_selinl env timeout 1500 $EVAL --scene repeat \
    --model best --fused-scoring --select inlier --out runs/synth_repeat_soft_t10b
echo "[orch] repeat consensus probe complete at $(date)"

# ---- appended: H=4096 e2e-step retry (chunked implicit step) ------------
watchdog_run e2e_step_h4096b env timeout 2400 python scripts/bench_e2e_step.py --hyps 4096 implicit
echo "[orch] h4096 retry complete at $(date)"
