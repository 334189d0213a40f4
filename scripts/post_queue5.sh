#!/bin/bash
# Round-3 artifact wave 5: jobs that were skipped when post_queue3.sh was
# edited mid-flight (bash re-read the script at a shifted offset — only
# obst_fc2 ran), plus the Mosaic kernel probe and a final bench with the
# per-path breakdown. Runs after post_queue4.sh drains. One TPU process
# at a time (memory: axon-tpu-serialization).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue5.log
echo "=== post_queue5 start $(date)" >> $LOG

QPID=${1:?pass post_queue4.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue4 drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

# which Pallas kernels does the real Mosaic toolchain accept?
run pallas_probe python scripts/probe_pallas_tpu.py artifacts/pallas_probe.json

# MoGAN relog: merged E/M-step losses.txt (first run only captured the
# M-step AM losses); identical program -> server compile cache is warm
run mogan_relog python -m vst.cli train-cyclegan --variant mogan \
  --sid 1 --data-dir /root/corpus --device-cache 1000 \
  --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
  --out-dir runs/mogan --log-every 50

# Sintel golden JSONs for the temporal CycleGAN variants
run eval_congan python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "congan:runs/congan" --hw 436 1024 \
  --out-dir artifacts/congan/eval_sintel
run eval_mogan python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "mogan:runs/mogan" --hw 436 1024 \
  --out-dir artifacts/mogan/eval_sintel

# OBST Sintel lambda=2000 retry if post_queue4's combined run timed out
if [ ! -f artifacts/obst/2000/TCL-ST.json ]; then
  run obst_eval_2000 python -m vst.cli eval-obst \
    --hw 436 1024 --n-videos 2 --n-frames 8 \
    --lambda-tcl 2000 --out-dir artifacts/obst
fi

# final bench with per-path breakdown + b32 configs
run bench_r3b python bench.py

echo "=== post_queue5 done $(date)" >> $LOG
