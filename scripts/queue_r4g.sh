#!/bin/bash
# Re-prioritized tail of queue_r4f (driver swapped mid-run; the g2 child
# keeps running and we wait on its PID): short reference-parity jobs
# first, then OBST regen, MoGAN full-log, SG2, survivors probe, the
# cyclegan family, bench-raft, bench. Probe-gated; do NOT edit while
# running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r4g.log
echo "=== queue_r4g start $(date)" >> $LOG

WPID=${1:?pass the running mega_g2 pid}
while kill -0 "$WPID" 2>/dev/null; do
  sleep 30
done
echo "--- mega_g2 ($WPID) drained $(date)" >> $LOG
sleep 45

probe() {
  timeout 120 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 60); do
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
  wait_healthy || { echo "--- $name SKIPPED (relay never healed) $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  echo "--- $name exit=$? $(date)" >> $LOG
  sleep 45
}

# ruder FC2 (the one g1 job that failed; CLI flag added in 2f71419) —
# with it, vst's committed eval set covers the reference's own tree
run fc2_ruder 2400 python -m vst.cli eval-fc2 --family faststyle \
  --method ruder --ckpt-dir runs/ruder_r4 --pre-style-ckpt runs/johnson \
  --hw 256 256 --batch-size 8 --data-dir /root/corpus \
  --out-dir artifacts/ruder/eval_fc2

run mega_g3 4200 python scripts/r4f_megajob.py g3
run mega_g5 3600 python scripts/r4f_megajob.py g5
run mega_g4 3600 python scripts/r4f_megajob.py g4
run probe_survivors 1800 python scripts/probe_pallas_tpu.py artifacts/pallas_probe.json
run mega_g6 5400 python scripts/r4f_megajob.py g6
run bench_raft_r4 2400 python -m vst.cli bench-raft --hw 436 1024 --out-dir artifacts/raft
run bench_r4 4200 python bench.py

echo "=== queue_r4g done $(date)" >> $LOG
