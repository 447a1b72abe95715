#!/bin/bash
# Launch a TPU python job with automatic wedge detection + relaunch.
#
# The axon device-claim handshake sometimes wedges a fresh process (lost
# claim message: futex wait, ~3s CPU, zero output — it never recovers, see
# CLAUDE.md).  This wrapper launches the command, waits for a liveness
# marker ("device claimed" or any output growth past the xla_bridge
# warning) within --probe seconds, and kills + relaunches on wedge.
#
# Usage: tpu_retry.sh <logfile> <max_attempts> <probe_s> -- <cmd...>
set -u
LOG="$1"; MAX="$2"; PROBE="$3"; shift 3
[ "$1" = "--" ] && shift

for attempt in $(seq 1 "$MAX"); do
  : > "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "[tpu_retry] attempt $attempt pid $PID" >> "$LOG.meta"
  # wait for liveness: >1 non-warning output line within PROBE seconds
  alive=0
  for i in $(seq 1 "$PROBE"); do
    sleep 1
    if ! kill -0 "$PID" 2>/dev/null; then
      # finished (or crashed) — either way, stop retrying on exit code 0
      wait "$PID"; rc=$?
      if [ $rc -eq 0 ]; then echo "[tpu_retry] done rc=0" >> "$LOG.meta"; exit 0; fi
      echo "[tpu_retry] exited rc=$rc" >> "$LOG.meta"; alive=2; break
    fi
    # any non-warning output line means the device claim went through
    if grep -qv "WARNING" "$LOG" 2>/dev/null; then alive=1; break; fi
  done
  if [ "$alive" = "1" ]; then
    echo "[tpu_retry] liveness ok, waiting for completion" >> "$LOG.meta"
    wait "$PID"; rc=$?
    echo "[tpu_retry] done rc=$rc" >> "$LOG.meta"
    exit $rc
  fi
  if [ "$alive" = "0" ]; then
    echo "[tpu_retry] wedged, killing $PID" >> "$LOG.meta"
    kill "$PID" 2>/dev/null; sleep 2
    kill -9 "$PID" 2>/dev/null
  fi
done
echo "[tpu_retry] giving up after $MAX attempts" >> "$LOG.meta"
exit 1
