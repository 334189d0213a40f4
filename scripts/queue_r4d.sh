#!/bin/bash
# Chains after queue_r4c ($1 = its bash pid): perf probes + fresh bench.
# Probe-gated; one TPU client at a time; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r4d.log
echo "=== queue_r4d start $(date)" >> $LOG

WPID=${1:?pass queue_r4c pid}
while kill -0 "$WPID" 2>/dev/null; do
  sleep 60
done
echo "--- queue_r4c ($WPID) drained $(date)" >> $LOG

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
  wait_healthy || { echo "--- $name SKIPPED $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  echo "--- $name exit=$? $(date)" >> $LOG
  sleep 45
}

run perfprobe_r4 7200 python scripts/r4_perfprobe.py runs/perfprobe_r4.json
run bench_r4a 4200 python bench.py

echo "=== queue_r4d done $(date)" >> $LOG
