#!/bin/bash
# Launch a TPU python job with automatic wedge detection + relaunch.
#
# The axon device-claim handshake sometimes wedges a fresh process (lost
# claim message: futex wait, ~3-6s CPU that stops growing, zero output — it
# never recovers, see CLAUDE.md).  Killing a process that HOLDS the claim
# locks the device for ~15 min until the lease expires, so the liveness
# test must not false-positive on slow imports/compiles: a process is
# declared wedged only if its CPU time stops growing (<1s growth over a
# 30s window) AND it has produced no non-warning output.
#
# Usage: tpu_retry.sh <logfile> <max_attempts> <initial_wait_s> -- <cmd...>
set -u
LOG="$1"; MAX="$2"; WAIT0="$3"; shift 3
[ "$1" = "--" ] && shift

cpu_jiffies() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo -1; }
has_output() { grep -qv "WARNING" "$LOG" 2>/dev/null; }

for attempt in $(seq 1 "$MAX"); do
  : > "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "[tpu_retry] attempt $attempt pid $PID" >> "$LOG.meta"
  sleep "$WAIT0"
  wedged=0
  while :; do
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; rc=$?
      echo "[tpu_retry] exited rc=$rc" >> "$LOG.meta"
      [ $rc -eq 0 ] && exit 0
      break  # nonzero exit: retry only if it produced no output (claim-ish)
    fi
    if has_output; then
      echo "[tpu_retry] liveness ok (output), waiting for completion" >> "$LOG.meta"
      wait "$PID"; rc=$?
      echo "[tpu_retry] done rc=$rc" >> "$LOG.meta"
      exit $rc
    fi
    c0=$(cpu_jiffies "$PID"); sleep 30; c1=$(cpu_jiffies "$PID")
    if [ "$c1" -ge 0 ] && [ $((c1 - c0)) -lt 100 ] && ! has_output; then
      echo "[tpu_retry] wedged (cpu $c0 -> $c1, no output), killing $PID" >> "$LOG.meta"
      kill "$PID" 2>/dev/null; sleep 2; kill -9 "$PID" 2>/dev/null
      wedged=1
      break
    fi
  done
  if [ "$wedged" = 1 ] && [ "$attempt" -lt "$MAX" ]; then
    # if the killed process had claimed the device, the lease needs to
    # expire before a relaunch can claim; the wedge signature (no output,
    # flat cpu) normally means it never claimed, so retry promptly
    sleep 5
  fi
done
echo "[tpu_retry] giving up after $MAX attempts" >> "$LOG.meta"
exit 1
