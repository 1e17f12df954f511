#!/bin/bash
# Stall watchdog for TPU jobs on the tunneled relay: the relay occasionally
# wedges mid-run (observed twice in round 3: a training job frozen on a
# futex with the log mtime stale for >10 min, and a fresh process hung on
# its first device op).  Runs a command, watches a progress file's mtime,
# and kills the job if no progress lands within the stall window.
#
# usage: watchdog.sh <stall_seconds> <progress_file> -- cmd args...
# exit: command's own code, or 42 on a detected stall.
STALL=$1
PROG=$2
shift 3

# setsid: run the job in its own process group so a stall-kill reaps the
# WHOLE tree (bash -c "python | tee" wrappers would otherwise leave the
# python/tee children holding the TPU relay while the queue retries)
setsid "$@" &
PID=$!
START=$(date +%s)
while kill -0 "$PID" 2>/dev/null; do
  sleep 30
  if [ -f "$PROG" ]; then
    M=$(stat -c %Y "$PROG")
    # pre-existing progress files (e.g. a --resume log) start stale:
    # never count time before this job started as stall time
    if [ "$M" -lt "$START" ]; then M=$START; fi
  else
    M=$START
  fi
  NOW=$(date +%s)
  if [ $((NOW - M)) -gt "$STALL" ]; then
    echo "WATCHDOG: no progress on $PROG in ${STALL}s; killing group $PID" >&2
    kill -- "-$PID" 2>/dev/null
    sleep 5
    kill -9 -- "-$PID" 2>/dev/null
    wait "$PID" 2>/dev/null
    exit 42
  fi
done
wait "$PID"
exit $?
