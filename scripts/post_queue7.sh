#!/bin/bash
# Round-3 wave 7: retries + extra throughput probes.
# - bench-raft artifact (wave-4 attempt died on a relay-unavailable blip
#   right after obst_eval's timeout kill)
# - SG2 bf16 throughput at batch 24/32 (is there headroom past 16.05?)
# Runs after post_queue6.sh drains. One TPU process at a time. The run()
# wrapper retries once after a cooldown when a job exits nonzero (the
# relay needs time to release after a killed predecessor).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue7.log
echo "=== post_queue7 start $(date)" >> $LOG

QPID=${1:?pass post_queue6.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue6 drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
  if [ $rc -ne 0 ]; then
    sleep 180
    echo "--- $name RETRY $(date)" >> $LOG
    timeout 4200 "$@" >> runs/$name.stdout 2>&1
    rc=$?
    echo "--- $name retry exit=$rc $(date)" >> $LOG
  fi
}

if [ ! -f artifacts/raft/raft_timing.json ]; then
  run bench_raft python -m vst.cli bench-raft \
    --hw 436 1024 --out-dir artifacts/raft
fi

run bench_sg2_b24 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput_b24.json 24 20 bf16

echo "=== post_queue7 done $(date)" >> $LOG
