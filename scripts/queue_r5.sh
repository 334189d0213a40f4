#!/bin/bash
# Round-5 TPU job queue. Jobs are lines in runs/queue_r5.jobs:
#   name|timeout_s|command...
# Completed (or skipped) jobs are recorded in runs/queue_r5.done; new jobs
# may be APPENDED to the jobs file at any time — this runner never needs
# editing while live. Stop by touching runs/queue_r5.stop.
#
# Relay discipline (NOTES_ROUND3/4): one TPU client at a time, probe-gate
# every job, sleep 45s after each exit before re-probing.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r5.log
JOBS=runs/queue_r5.jobs
DONE=runs/queue_r5.done
touch "$JOBS" "$DONE"
echo "=== queue_r5 start $(date)" >> "$LOG"

probe() {
  timeout 120 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 200); do
    if probe; then
      echo "--- relay healthy (try $i) $(date)" >> "$LOG"
      return 0
    fi
    echo "--- relay unhealthy, idling 150s (try $i) $(date)" >> "$LOG"
    sleep 150
  done
  return 1
}

while true; do
  if [ -f runs/queue_r5.stop ]; then
    echo "=== queue_r5 stopped by sentinel $(date)" >> "$LOG"
    break
  fi
  line=$(grep -vxF -f "$DONE" "$JOBS" 2>/dev/null | grep -v '^[[:space:]]*$' | head -1 || true)
  if [ -z "$line" ]; then
    sleep 30
    continue
  fi
  name=${line%%|*}
  rest=${line#*|}
  tmo=${rest%%|*}
  cmd=${rest#*|}
  if ! wait_healthy; then
    echo "--- $name SKIPPED (relay never healed) $(date)" >> "$LOG"
    echo "$line" >> "$DONE"
    continue
  fi
  echo "--- $name start $(date)" >> "$LOG"
  timeout "$tmo" bash -c "$cmd" >> "runs/$name.stdout" 2>&1
  echo "--- $name exit=$? $(date)" >> "$LOG"
  echo "$line" >> "$DONE"
  sleep 45
done
