#!/bin/bash
# Round-3 wave 6: batched-path bisect at the headline config, then a
# Johnson Sintel eval regen with dt-iters=20 (the committed DT JSONs were
# produced at 5 iters/window and carry ~4 ms/frame of tunnel-sync
# amortization). Runs after post_queue5.sh drains. One TPU process at a
# time (memory: axon-tpu-serialization).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue6.log
echo "=== post_queue6 start $(date)" >> $LOG

QPID=${1:?pass post_queue5.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue5 drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

run bisect_b16 python scripts/bisect_b16.py runs/bisect_b16.json

run johnson_eval20 python -m vst.cli eval-sintel --method johnson \
  --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 --dt-iters 20 \
  --out-dir artifacts/johnson/eval_sintel

echo "=== post_queue6 done $(date)" >> $LOG
