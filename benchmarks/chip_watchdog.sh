#!/bin/bash
# Resumable chip-run driver (benchmarks/chip_watchdog.sh LOG cmd...) with stall detection: the axon worker
# occasionally wedges mid-call (log goes stale); kill the EXACT child pid
# and resume from the orbax checkpoint.
LOG="$1"; shift
for i in $(seq 1 40); do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt 300 ]; then
      echo "# watchdog: log stale ${age}s, killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  grep -q '"config": "5_inverse' "$LOG" && break
  sleep 10
done
echo "# watchdog done" >> "$LOG"
