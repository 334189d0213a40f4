#!/bin/bash
# Round-3 session-3 TPU queue. Fresh container: runs/ checkpoints and
# /root/corpus did NOT survive, so jobs needing trained weights come
# after a johnson retrain; pure-measurement jobs (random weights) run
# first in value order. Probe-gated (memory: axon-tpu-serialization);
# do NOT edit while running (memory: queue-scripts-immutable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r3c.log
echo "=== queue_r3c start $(date)" >> $LOG

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

# Tier 1: perf measurements on random weights (inform this session's
# kernel work). Relay was healthy at 12:46 (pallas_probe ran); short settle.
sleep 60

run bench_r3c 4200 python bench.py
run bisect_b16 4200 python scripts/bisect_b16.py runs/bisect_b16.json
run bisect_raft 4200 python scripts/bisect_raft.py runs/bisect_raft.json
run bench_raft 4200 python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft
run bench_sg2_b24 4200 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput_b24.json 24 20 bf16

# Tier 2: the missing committed OBST lambda=2000 Sintel artifact
# (lambda-contrast shape, VERDICT r2 item 4)
if [ ! -f artifacts/obst/2000/TCL-ST.json ]; then
  run obst_eval_2000 6000 python -m vst.cli eval-obst \
    --hw 436 1024 --n-videos 2 --n-frames 8 \
    --lambda-tcl 2000 --out-dir artifacts/obst
fi

# Tier 3: flagship retrain + warmed dt-iters-20 Sintel eval regen.
# Wait for the CPU corpus regen (launched separately) to finish its
# sentinel before training.
for i in $(seq 1 120); do
  [ -f /root/corpus/.done ] && break
  sleep 60
done
if [ -f /root/corpus/.done ]; then
  run johnson_train 4800 python -m vst.cli train-faststyle --method johnson \
    --n-styles 3 --data-dir /root/corpus/DATAFiles --device-cache 2000 \
    --steps 3000 --batch-size 16 --hw 256 256 \
    --out-dir runs/johnson --log-every 50
  run johnson_eval20 4200 python -m vst.cli eval-sintel --method johnson \
    --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
    --out-dir artifacts/johnson/eval_sintel
else
  echo "--- corpus never appeared; johnson retrain SKIPPED $(date)" >> $LOG
fi

# Tier 4: OBST lambda=0 regen with the LBFGS warm-up fix (committed DT
# carries 10-18 s cold-compile outliers vs the 2.9 s steady state)
run obst_eval_0 6000 python -m vst.cli eval-obst \
  --hw 436 1024 --n-videos 2 --n-frames 8 \
  --lambda-tcl 0 --out-dir artifacts/obst

echo "=== queue_r3c done $(date)" >> $LOG
