#!/usr/bin/env bash
# babysit.sh <stall_seconds> <logfile> <cmd...>
#
# Runs <cmd> with stdout/stderr appended to <logfile> and watches the log's
# mtime: if it stalls longer than <stall_seconds>, the command's process
# group is killed (exact PGID of the child we spawned — never by pattern)
# and the command restarts. The axon relay occasionally drops an RPC on the
# floor mid-run (observed round 4: training parked every thread in futex
# waits at step 43k with the log silent for 30+ min); training auto-resumes
# from its latest checkpoint and the batch stages are idempotent, so
# kill-and-restart is safe.
#
# Usage: bash scripts/babysit.sh 900 runs/r4_train.log \
#          python -m nann_tpu.main --job-type train ...
set -u
STALL_S=$1; shift
LOG=$1; shift
MAX_RESTARTS=${MAX_RESTARTS:-12}

attempt=0
while [ "$attempt" -le "$MAX_RESTARTS" ]; do
  attempt=$((attempt + 1))
  echo "[babysit] attempt $attempt: $* >> $LOG" | tee -a "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "[babysit] log silent $((now - mt))s > ${STALL_S}s — killing PGID $PID" | tee -a "$LOG"
      kill -TERM -- "-$PID" 2>/dev/null
      sleep 10
      kill -KILL -- "-$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[babysit] done rc=0 after $attempt attempt(s)" | tee -a "$LOG"
    exit 0
  fi
  echo "[babysit] rc=$rc — restarting in 30s" | tee -a "$LOG"
  sleep 30
done
echo "[babysit] gave up after $MAX_RESTARTS restarts" | tee -a "$LOG"
exit 1
