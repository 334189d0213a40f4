#!/bin/bash
# Chains after queue_r4d ($1): regenerate the OBST lambda-contrast Sintel
# artifacts with the round-4 driver (torch-exact [60,60,40] compact LBFGS,
# frame-0 zero mask, net.run-only DT timer, RAFT-MS reported separately),
# 3 videos (VERDICT r3 item 5). Probe-gated; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r4e.log
echo "=== queue_r4e start $(date)" >> $LOG

WPID=${1:?pass queue_r4d pid}
while kill -0 "$WPID" 2>/dev/null; do
  sleep 60
done
echo "--- queue_r4d ($WPID) drained $(date)" >> $LOG

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

# SG2 Sintel eval retry (the 436-row synthetic video broke the /16 G;
# the CLI now crops to 432 like the reference, commit pending)
run eval_sg2_r4 4200 python -m vst.cli eval-sintel --family stargan2 \
  --ckpt-dir runs/stargan2_advcon --hw 436 1024 \
  --out-dir artifacts/stargan2_advcon/eval_sintel

# stargan1 retrain at the cache-native 256 (the hw-128 recipe from the
# never-run r3f queue crashes: D cls head (16,3,3,4) vs (16,4) — the
# device cache yields 256^2 samples) + its Sintel/FC2 evals
run train_stargan1 4200 python -m vst.cli train-stargan \
  --num-domains 4 --data-dir /root/corpus --device-cache 1000 \
  --steps 2000 --batch-size 8 --hw 256 256 \
  --out-dir runs/stargan1 --log-every 50
run eval_sg1 4200 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel
run fc2_sg1 4200 python -m vst.cli eval-fc2 --family stargan \
  --ckpt-dir runs/stargan1 --hw 256 256 --batch-size 8 \
  --data-dir /root/corpus --out-dir artifacts/stargan1/eval_fc2

# quick wins first: ruder evals with the streaming drivers (the generic
# path raised ScopeParamShapeError — commit 86f630e)
run eval_ruder_r4 4200 python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r4 --pre-style-ckpt runs/johnson \
  --hw 436 1024 --out-dir artifacts/ruder/eval_sintel
run fc2_ruder_r4 4200 python -m vst.cli eval-fc2 --family faststyle \
  --method ruder --ckpt-dir runs/ruder_r4 --pre-style-ckpt runs/johnson \
  --hw 256 256 --batch-size 8 --data-dir /root/corpus \
  --out-dir artifacts/ruder/eval_fc2

run obst_r4_2000 7200 python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 3 --n-frames 8 \
  --lambda-tcl 2000 --out-dir artifacts/obst
run obst_r4_0 7200 python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 3 --n-frames 8 \
  --lambda-tcl 0 --out-dir artifacts/obst

echo "=== queue_r4e done $(date)" >> $LOG
