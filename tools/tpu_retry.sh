#!/bin/bash
# Run a TPU command with hang detection and retry.
#
# The tunneled remote-compile service intermittently hangs on a request (zero
# link traffic, no response, indefinitely — observed repeatedly in round 3);
# a killed-and-retried process virtually always compiles fine. This wrapper
# watches the log AND the network counters: if both stall for $STALL_SECS
# (default 420 — longer than any healthy silent compile gap observed), it
# kills the attempt and retries (max 3).
#
# Usage: tools/tpu_retry.sh <logfile> <command...>
set -u
LOG=$1; shift
STALL_SECS=${STALL_SECS:-420}
for attempt in 1 2 3; do
  echo "=== attempt $attempt $(date +%T) ===" >> "$LOG"
  timeout "${ATTEMPT_TIMEOUT:-2400}" "$@" >> "$LOG" 2>&1 &
  pid=$!
  last_size=0; stall=0
  while kill -0 $pid 2>/dev/null; do
    sleep 30
    size=$(wc -c < "$LOG")
    rx=$(grep eth0 /proc/net/dev | awk '{print $2}')
    sleep 5
    rx2=$(grep eth0 /proc/net/dev | awk '{print $2}')
    if [ "$size" == "$last_size" ] && [ "$rx" == "$rx2" ]; then
      stall=$((stall + 35))
    else
      stall=0
    fi
    last_size=$size
    if [ $stall -ge "$STALL_SECS" ]; then
      echo "=== stall detected, killing attempt $attempt ===" >> "$LOG"
      kill $pid
      break
    fi
  done
  wait $pid; rc=$?
  echo "=== attempt $attempt exit $rc $(date +%T) ===" >> "$LOG"
  [ $rc -eq 0 ] && exit 0
done
exit 1
