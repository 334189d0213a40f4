#!/bin/bash
# Round-4 queue, consolidated: three in-process mega-jobs (one TPU client
# session each — scripts/r4_megajob.py) instead of per-step processes;
# per-process transitions cost ~10 min of relay client-release + probe
# retries (runs/queue_r4b.log). Probe-gated; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r4c.log
echo "=== queue_r4c start $(date)" >> $LOG

probe() {
  timeout 120 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 120); do
    if probe; then
      echo "--- relay healthy (try $i) $(date)" >> $LOG
      return 0
    fi
    echo "--- relay unhealthy, idling 150s (try $i) $(date)" >> $LOG
    sleep 150
  done
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_healthy || { echo "--- $name SKIPPED (relay never healed) $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  local rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
  sleep 45
}

run mega_faststyle 10800 python scripts/r4_megajob.py faststyle
run mega_gan1 10800 python scripts/r4_megajob.py gan1
run mega_gan2 10800 python scripts/r4_megajob.py gan2

echo "=== queue_r4c done $(date)" >> $LOG
