#!/bin/bash
# Round-3 wave 8: RAFT stage bisect (per-GRU-iter slope, lookup kernel vs
# XLA gather, corr-build cost) to budget the <=60 ms/pair goal.
# Runs after post_queue7.sh drains. One TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue8.log
echo "=== post_queue8 start $(date)" >> $LOG

QPID=${1:?pass post_queue7.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue7 drained $(date)" >> $LOG

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
    echo "--- $name retry exit=$? $(date)" >> $LOG
  fi
}

run bisect_raft python scripts/bisect_raft.py runs/bisect_raft.json

echo "=== post_queue8 done $(date)" >> $LOG
