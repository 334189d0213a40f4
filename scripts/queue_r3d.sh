#!/bin/bash
# Round-3 session-3 queue, wave 2: probes the REWRITTEN Pallas kernels
# (sidecar-halo auto-pipelined v3 — the manual DMA protocol crashed the
# v5e server toolchain) before the long eval jobs, then runs the rest of
# the r3c plan. Takes over from queue_r3c.sh (wrapper killed at the
# bisect_b16 job boundary; $1 = PID of the orphaned in-flight job to
# wait for). Probe-gated; one TPU process at a time; do NOT edit while
# running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r3d.log
echo "=== queue_r3d start $(date)" >> $LOG

WPID=${1:-0}
while kill -0 "$WPID" 2>/dev/null; do
  sleep 30
done
echo "--- in-flight job ($WPID) drained $(date)" >> $LOG

probe() {
  timeout 300 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 40); do
    if probe; then
      echo "--- relay healthy (try $i) $(date)" >> $LOG
      return 0
    fi
    echo "--- relay unhealthy, idling 600s (try $i) $(date)" >> $LOG
    sleep 600
  done
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  wait_healthy || { echo "--- $name SKIPPED (relay never healed) $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  local rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
  if [ $rc -ne 0 ]; then
    sleep 120
    wait_healthy || { echo "--- $name retry SKIPPED $(date)" >> $LOG; return; }
    echo "--- $name RETRY $(date)" >> $LOG
    timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
    echo "--- $name retry exit=$? $(date)" >> $LOG
  fi
}

# 1. Mosaic acceptance + isolated timings of the REWRITTEN kernels
#    (+ identity-conv relayout A/B)
run probe_v3 2400 python scripts/probe_pallas_tpu.py artifacts/pallas_probe.json

# 2. bench with the new kernels (b1 pallas paths, fastp trunk)
run bench_r3d 4200 python bench.py

# 3. RAFT: stage bisect + committed pair-timing artifact
run bisect_raft 4200 python scripts/bisect_raft.py runs/bisect_raft.json
run bench_raft 4200 python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft

# 4. SG2 throughput at batch 24
run bench_sg2_b24 4200 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput_b24.json 24 20 bf16

# 5. missing committed OBST lambda=2000 Sintel artifact
if [ ! -f artifacts/obst/2000/TCL-ST.json ]; then
  run obst_eval_2000 6000 python -m vst.cli eval-obst \
    --hw 436 1024 --n-videos 2 --n-frames 8 \
    --lambda-tcl 2000 --out-dir artifacts/obst
fi

# 6. flagship retrain + warmed dt-iters-20 Sintel eval regen
if [ -f /root/corpus/.done ]; then
  run johnson_train 4800 python -m vst.cli train-faststyle --method johnson \
    --n-styles 3 --data-dir /root/corpus/DATAFiles --device-cache 2000 \
    --steps 3000 --batch-size 16 --hw 256 256 \
    --out-dir runs/johnson --log-every 50
  run johnson_eval20 4200 python -m vst.cli eval-sintel --method johnson \
    --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
    --out-dir artifacts/johnson/eval_sintel
fi

# 7. OBST lambda=0 regen with the LBFGS warm-up fix
run obst_eval_0 6000 python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 2 --n-frames 8 \
  --lambda-tcl 0 --out-dir artifacts/obst

echo "=== queue_r3d done $(date)" >> $LOG
