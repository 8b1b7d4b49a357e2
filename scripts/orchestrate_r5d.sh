#!/bin/bash
# Round-5d: bounded re-run of the dense_ctx repeat experiment after the
# r5b/r5c tunnel outage wiped the runs/ snapshot.  Same question as
# orchestrate_r5c.sh (can the ~530 px receptive field break the repeat
# texture-period ambiguity?) but sized to COMPLETE inside one driver
# round on a cold start: 40k pretrain updates (dense-arch rate is
# ~100 upd/s; the r5b trajectory showed most convergence by 10k) and
# the init eval, no e2e stage.  Every stage still resumes from orbax,
# so a longer follow-up run can extend this one's snapshot.
cd /root/repo
LOG=runs/logs
mkdir -p $LOG

WATCHDOG_TAG=orch5d
source "$(dirname "$0")/lib_watchdog.sh"

OUT=runs/synth_repeat_ctx
EVAL="python -m dsac_tpu.cli.test_ransac --synthetic 24 --seed 99 --arch dense_ctx --scene repeat --fused-refine -rdraw 0 --out $OUT"

watchdog_run ctx_pretrain env python -m dsac_tpu.cli.train_obj \
    --synthetic 512 --seed 3 --arch dense_ctx --scene repeat \
    --updates 40000 --dense-batch 2 --steps-per-call 50 \
    --validate-every 5000 --out $OUT
watchdog_run ctx_init_eval env timeout 1200 $EVAL --model init --fused-scoring
echo "[orch5d] complete at $(date)"
