#!/bin/bash
# Follow-up wave: regenerate the OBST lambda=0 Sintel artifacts with the
# LBFGS warm-up fix (committed DT carried 10-18 s cold-compile outliers),
# then refresh bench one final time. Runs after queue_master.sh drains.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_followup.log
echo "=== queue_followup start $(date)" >> $LOG

QPID=${1:?pass queue_master.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- queue_master drained $(date)" >> $LOG

probe() {
  timeout 300 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 30); do
    if probe; then return 0; fi
    echo "--- relay unhealthy, idling 600s (try $i) $(date)" >> $LOG
    sleep 600
  done
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_healthy || { echo "--- $name SKIPPED $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  echo "--- $name exit=$? $(date)" >> $LOG
}

run obst_eval_0 6000 python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 2 --n-frames 8 \
  --lambda-tcl 0 --out-dir artifacts/obst

run bench_final 4200 python bench.py

echo "=== queue_followup done $(date)" >> $LOG
