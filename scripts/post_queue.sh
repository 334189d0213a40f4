#!/bin/bash
# Round-3 post-training TPU chain: retries the OOM'd ConGAN run at a
# smaller footprint, then produces every committed-artifact measurement
# VERDICT r2 asked for (OBST lambda contrast, RAFT timing, SG2 bf16
# throughput, warmed Johnson DT, final bench). Serialized — one TPU
# process at a time (the axon relay wedges otherwise).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
C=/root/corpus
LOG=runs/post_queue.log
echo "=== post_queue start $(date)" >> $LOG

# wait for the training queue to drain (pid passed by the launcher —
# /tmp/queue.pid proved stale once, so take it as $1)
QPID=${1:-$(cat /tmp/queue.pid 2>/dev/null || echo 0)}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- queue drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

# ConGAN OOM'd at b4/cache2000/raft12 (RESOURCE_EXHAUSTED): halve batch
# and cache, trim GRU iters
if [ ! -d runs/congan/002000 ]; then
  run congan_retry python -m vst.cli train-cyclegan --variant congan \
    --sid 1 --data-dir $C --device-cache 1000 \
    --steps 2000 --batch-size 2 --hw 256 256 --raft-iters 8 \
    --out-dir runs/congan --log-every 50
fi

# MoGAN fallback if the queue run died the same way
if [ ! -d runs/mogan/001500 ] && [ ! -d runs/mogan/001000 ]; then
  run mogan_retry python -m vst.cli train-cyclegan --variant mogan \
    --sid 1 --data-dir $C --device-cache 1000 \
    --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
    --out-dir runs/mogan --log-every 50
fi

# OBST Sintel eval at both lambda_tcl settings, full Sintel resolution
run obst_eval python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 2 --n-frames 8 \
  --lambda-tcl 0 2000 --out-dir artifacts/obst

# RAFT pair timing artifact at Sintel resolution
run bench_raft python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft

# SG2 AdvCon bf16-vs-f32 training throughput
run bench_sg2 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput.json 16 30

# Johnson Sintel eval regen (DT warm-up fix in, per-style spread <10%)
run johnson_eval python -m vst.cli eval-sintel --method johnson \
  --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
  --out-dir artifacts/johnson/eval_sintel

# headline bench with the fused-Pallas b1 path
run bench_r3 python bench.py

echo "=== post_queue done $(date)" >> $LOG
