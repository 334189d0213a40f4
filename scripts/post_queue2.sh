#!/bin/bash
# Round-3 artifact wave 2: Sintel + FC2 eval JSONs for every trained
# method, mirroring the reference's committed golden set
# (eval_sintel/{johnson,ruder,huang,dumoulin}, StarGAN/{eval,sintel_eval},
# eval_fc2/{johnson,ruder}). Runs after post_queue.sh drains. One TPU
# process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue2.log
echo "=== post_queue2 start $(date)" >> $LOG

QPID=${1:?pass post_queue.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

# Sintel eval artifacts for the remaining trained faststyle methods
for m in dumoulin huang reconet; do
  run eval_$m python -m vst.cli eval-sintel --method $m \
    --n-styles 3 --ckpt-dir runs/$m --hw 436 1024 \
    --out-dir artifacts/$m/eval_sintel
done
run eval_ruder python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r3 --hw 436 1024 \
  --out-dir artifacts/ruder/eval_sintel

# GAN-family Sintel golden JSONs (reference: StarGAN/sintel_eval,
# StarGANv2Adv solver.py:268-356, CycleGAN/sintel_eval.py)
run eval_sg1 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel
run eval_sg2 python -m vst.cli eval-sintel --family stargan2 \
  --ckpt-dir runs/stargan2_advcon --hw 436 1024 \
  --out-dir artifacts/stargan2_advcon/eval_sintel
run eval_cg python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "cyclegan:runs/cyclegan_sid1,cyclegan_con:runs/cyclegan_con" \
  --hw 436 1024 --out-dir artifacts/cyclegan_sid1/eval_sintel

# FC2 metric artifacts for the faststyle family (reference
# eval_fc2/{johnson,ruder}) and StarGAN v1 (StarGAN/eval)
run fc2_johnson python -m vst.cli eval-fc2 --family faststyle \
  --method johnson --ckpt-dir runs/johnson --hw 256 256 --batch-size 8 \
  --data-dir /root/corpus --out-dir artifacts/johnson/eval_fc2
run fc2_ruder python -m vst.cli eval-fc2 --family faststyle \
  --method ruder --ckpt-dir runs/ruder_r3 --hw 256 256 --batch-size 8 \
  --data-dir /root/corpus --out-dir artifacts/ruder/eval_fc2
run fc2_sg1 python -m vst.cli eval-fc2 --family stargan \
  --ckpt-dir runs/stargan1 --hw 256 256 --batch-size 8 \
  --data-dir /root/corpus --out-dir artifacts/stargan1/eval_fc2

echo "=== post_queue2 done $(date)" >> $LOG
