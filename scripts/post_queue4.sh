#!/bin/bash
# Round-3 artifact wave 4: re-run every 436x1024 job that crashed on the
# RAFT multiple-of-8 init bug (fixed in a5941de — _make_raft / bench-raft
# now init at the InputPadder-padded shape). Runs after post_queue3.sh
# drains. One TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/post_queue4.log
echo "=== post_queue4 start $(date)" >> $LOG

QPID=${1:?pass post_queue3.sh pid}
while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
done
echo "--- post_queue3 drained $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

# Johnson Sintel eval regen (DT warm-up fix, per-style spread <10%)
run johnson_eval python -m vst.cli eval-sintel --method johnson \
  --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
  --out-dir artifacts/johnson/eval_sintel

# OBST Sintel eval at both lambda_tcl settings, full Sintel resolution
run obst_eval python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 2 --n-frames 8 \
  --lambda-tcl 0 2000 --out-dir artifacts/obst

# RAFT pair timing artifact at Sintel resolution
run bench_raft python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft

# Sintel eval artifacts for the remaining trained faststyle methods
for m in dumoulin huang reconet; do
  run eval_$m python -m vst.cli eval-sintel --method $m \
    --n-styles 3 --ckpt-dir runs/$m --hw 436 1024 \
    --out-dir artifacts/$m/eval_sintel
done
run eval_ruder python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r3 --hw 436 1024 \
  --out-dir artifacts/ruder/eval_sintel

# GAN-family Sintel golden JSONs
run eval_sg1 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel
run eval_sg2 python -m vst.cli eval-sintel --family stargan2 \
  --ckpt-dir runs/stargan2_advcon --hw 436 1024 \
  --out-dir artifacts/stargan2_advcon/eval_sintel
run eval_cg python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "cyclegan:runs/cyclegan_sid1,cyclegan_con:runs/cyclegan_con" \
  --hw 436 1024 --out-dir artifacts/cyclegan_sid1/eval_sintel

echo "=== post_queue4 done $(date)" >> $LOG
