#!/bin/bash
# Round-4 session-2 TPU queue: golden-JSON regeneration in priority
# order (see scripts/r4f_megajob.py header). Probe-gated; one TPU client
# at a time; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_r4f.log
echo "=== queue_r4f start $(date)" >> $LOG

# gate on the corpus generator finishing
while [ -f /tmp/datagen.pid ] && kill -0 "$(cat /tmp/datagen.pid)" 2>/dev/null; do
  sleep 15
done
echo "--- corpus ready ($(ls /root/corpus/DATAFiles | wc -l) files) $(date)" >> $LOG

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
  sleep 45  # relay client-release settle before the next probe
}

run mega_g1 3900 python scripts/r4f_megajob.py g1
run mega_g2 3600 python scripts/r4f_megajob.py g2
run mega_g3 5400 python scripts/r4f_megajob.py g3
run mega_g4 3600 python scripts/r4f_megajob.py g4
run mega_g5 3600 python scripts/r4f_megajob.py g5
run mega_g6 5400 python scripts/r4f_megajob.py g6
run bench_raft_r4 2400 python -m vst.cli bench-raft --hw 436 1024 --out-dir artifacts/raft
run bench_r4 4200 python bench.py

echo "=== queue_r4f done $(date)" >> $LOG
