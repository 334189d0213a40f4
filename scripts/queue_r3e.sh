#!/bin/bash
# Round-3 session-4 queue: measures the session-3 uncommitted work on the
# real chip — bench with the new b1 fast-path configs + b64, the b1 stage
# bisect (f32 + bf16) for the ≤5.9/≤4.5 ms latency plan, the rewritten
# chained-timing RAFT bisect for the ≤60 ms/pair plan, and the SG2 b24
# throughput retry (dtype-alias fix). Probe-gated; one TPU process at a
# time; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r3e.log
echo "=== queue_r3e start $(date)" >> $LOG

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

# 1. headline bench with the new configs (f32/bf16 b1 fast, b64 fast)
run bench_r3e 4200 python bench.py

# 2. b1 stage bisect, both dtypes — the latency plan's budget table
run bisect_b1_bf16 3600 python scripts/bisect_b16.py runs/bisect_b1_bf16.json 1 bfloat16
run bisect_b1_f32 3600 python scripts/bisect_b16.py runs/bisect_b1_f32.json 1 float32

# 3. RAFT stage bisect with chained timing (honest per-stage budget)
run bisect_raft2 4800 python scripts/bisect_raft.py runs/bisect_raft.json

# 4. SG2 throughput at batch 24 (dtype-alias fix landed)
run bench_sg2_b24 4200 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput_b24.json 24 20 bf16

echo "=== queue_r3e done $(date)" >> $LOG
