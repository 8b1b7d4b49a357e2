# Shared TPU-campaign watchdog (source this; do not execute).
#
#   WATCHDOG_TAG=orch5            # plain assignment on its own line —
#   source scripts/lib_watchdog.sh  # a `VAR=x source f` prefix binding
#   watchdog_run <name> <command..> # is discarded when source returns
#
# Runs <command> in its own session (setsid), appending to
# runs/logs/<name>_orch.log.  If the log goes stale for
# WATCHDOG_STALE_S seconds (default 1500 — the axon tunnel hangs a
# step ~1-2x per 2h, and the silent 512-frame staging phase runs
# ~10-13 min, so thresholds under ~20 min false-positive), the exact
# process GROUP is killed and the command relaunched (every training
# stage resumes from its latest orbax snapshot).  Up to 4 attempts.
#
# NEVER use this to stop a HEALTHY stepping process (e.g. to change
# its args): a mid-RPC kill orphans the server-side TPU claim and
# wedges the tunnel for 1h+ (CLAUDE.md gotchas, 2026-08-21).

WATCHDOG_STALE_S=${WATCHDOG_STALE_S:-1500}
WATCHDOG_TAG=${WATCHDOG_TAG:-orch}

watchdog_run() {
  local name=$1; shift
  local log=${WATCHDOG_LOG_DIR:-runs/logs}/${name}_orch.log
  mkdir -p "$(dirname "$log")"
  local rc attempt
  for attempt in 1 2 3 4; do
    echo "[$WATCHDOG_TAG] $(date +%H:%M) $name attempt $attempt"
    setsid "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 20
      if [ $(( $(date +%s) - $(stat -c %Y "$log") )) -gt $WATCHDOG_STALE_S ]; then
        echo "[$WATCHDOG_TAG] $(date +%H:%M) $name HANG (log stale >${WATCHDOG_STALE_S}s); killing group $pid"
        kill -- -$pid 2>/dev/null; sleep 5; kill -9 -- -$pid 2>/dev/null
      fi
    done
    wait $pid; rc=$?
    echo "[$WATCHDOG_TAG] $(date +%H:%M) $name attempt $attempt rc=$rc"
    [ $rc -eq 0 ] && return 0
    sleep 10
  done
  echo "[$WATCHDOG_TAG] $name FAILED after 4 attempts"
  return 1
}
