#!/bin/bash
# Consolidated round-3 TPU queue (replaces the post_queue4..8 chain after
# the relay wedged at 22:39 on obst_eval's timeout kill and back-to-back
# init-retry storms kept it wedged). Discipline:
#   * idle settle window first,
#   * probe-gate EVERY job (tiny matmul under a short timeout),
#   * one retry per job after a cooldown,
#   * jobs ordered by value (kernel probe + bench first).
# One TPU process at a time (memory: axon-tpu-serialization). Do NOT edit
# this file while it runs (memory: queue-scripts-immutable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=runs/queue_master.log
echo "=== queue_master start $(date)" >> $LOG

probe() {
  timeout 300 python scripts/tpu_probe.py >> runs/tpu_probe.log 2>&1
}

wait_healthy() {
  local i
  for i in $(seq 1 60); do
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

# settle window: zero TPU clients for 15 min before the first probe
sleep 900

# 1. Mosaic kernel acceptance + isolated timings (gates the b1 work)
run pallas_probe 2400 python scripts/probe_pallas_tpu.py artifacts/pallas_probe.json

# 2. bench with per-path breakdown (b1 Pallas paths, fastp trunk, b32)
run bench_r3b 4200 python bench.py

# 3. batched-stage bisect at the headline config
run bisect_b16 4200 python scripts/bisect_b16.py runs/bisect_b16.json

# 4. MoGAN relog (merged E/M losses.txt)
run mogan_relog 4200 python -m vst.cli train-cyclegan --variant mogan \
  --sid 1 --data-dir /root/corpus --device-cache 1000 \
  --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
  --out-dir runs/mogan --log-every 50

# 5. faststyle Sintel evals (dt-iters now defaults to 20)
run eval_dumoulin 4200 python -m vst.cli eval-sintel --method dumoulin \
  --n-styles 3 --ckpt-dir runs/dumoulin --hw 436 1024 \
  --out-dir artifacts/dumoulin/eval_sintel
run eval_huang 4200 python -m vst.cli eval-sintel --method huang \
  --n-styles 3 --ckpt-dir runs/huang --hw 436 1024 \
  --out-dir artifacts/huang/eval_sintel
run eval_reconet 4200 python -m vst.cli eval-sintel --method reconet \
  --n-styles 3 --ckpt-dir runs/reconet --hw 436 1024 \
  --out-dir artifacts/reconet/eval_sintel
run eval_ruder 4200 python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r3 --hw 436 1024 \
  --out-dir artifacts/ruder/eval_sintel
run johnson_eval20 4200 python -m vst.cli eval-sintel --method johnson \
  --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
  --out-dir artifacts/johnson/eval_sintel

# 6. GAN-family Sintel golden JSONs
run eval_sg1 4200 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel
run eval_sg2 4200 python -m vst.cli eval-sintel --family stargan2 \
  --ckpt-dir runs/stargan2_advcon --hw 436 1024 \
  --out-dir artifacts/stargan2_advcon/eval_sintel
run eval_cg 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "cyclegan:runs/cyclegan_sid1,cyclegan_con:runs/cyclegan_con" \
  --hw 436 1024 --out-dir artifacts/cyclegan_sid1/eval_sintel
run eval_congan 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "congan:runs/congan" --hw 436 1024 \
  --out-dir artifacts/congan/eval_sintel
run eval_mogan 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "mogan:runs/mogan" --hw 436 1024 \
  --out-dir artifacts/mogan/eval_sintel

# 7. OBST Sintel lambda=2000 (last attempt needed >70 min at 2 lambdas;
# single lambda with a generous cap)
if [ ! -f artifacts/obst/2000/TCL-ST.json ]; then
  run obst_eval_2000 6000 python -m vst.cli eval-obst \
    --hw 436 1024 --n-videos 2 --n-frames 8 \
    --lambda-tcl 2000 --out-dir artifacts/obst
fi

# 8. RAFT artifacts + stage bisect
run bench_raft 4200 python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft
run bisect_raft 4200 python scripts/bisect_raft.py runs/bisect_raft.json

# 9. SG2 throughput at batch 24
run bench_sg2_b24 4200 python scripts/bench_sg2.py \
  artifacts/stargan2_advcon/throughput_b24.json 24 20 bf16

echo "=== queue_master done $(date)" >> $LOG
