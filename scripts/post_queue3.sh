#!/bin/bash
# Round-3 artifact wave 3: OBST FC2 metric artifacts at both lambda_tcl
# settings (reference golden set: methods/optimization-based/eval_fc2/
# {0,2000}/{FID,TCL}.json — the 26.93 -> 9.69 FC2 TCL contrast).
# Runs after post_queue2.sh drains. One TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue3.log
echo "=== post_queue3 start $(date)" >> $LOG

QPID=${1:?pass post_queue2.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue2 drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

# which Pallas kernels does the real Mosaic toolchain accept?
run pallas_probe python scripts/probe_pallas_tpu.py artifacts/pallas_probe.json

# re-run MoGAN with the merged E/M-step logging (the first run's
# losses.txt only captured the M-step AM losses); identical program →
# server compile cache makes this fast
run mogan_relog python -m vst.cli train-cyclegan --variant mogan \
  --sid 1 --data-dir /root/corpus --device-cache 1000 \
  --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
  --out-dir runs/mogan --log-every 50

run obst_fc2 python -m vst.cli eval-fc2 --family obst \
  --hw 256 256 --batch-size 4 --num-domains 4 \
  --data-dir /root/corpus --obst-lambdas 0 2000 \
  --out-dir artifacts/obst/eval_fc2

# Sintel harness runs for the temporal CycleGAN variants trained this
# round (ConGAN, MoGAN) — completes the per-method golden-JSON set
if [ -d runs/congan ]; then
  run eval_congan python -m vst.cli eval-sintel --family cyclegan \
    --ckpt-dir "congan:runs/congan" --hw 436 1024 \
    --out-dir artifacts/congan/eval_sintel
fi
if [ -d runs/mogan ]; then
  run eval_mogan python -m vst.cli eval-sintel --family cyclegan \
    --ckpt-dir "mogan:runs/mogan" --hw 436 1024 \
    --out-dir artifacts/mogan/eval_sintel
fi

echo "=== post_queue3 done $(date)" >> $LOG
