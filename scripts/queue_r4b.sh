#!/bin/bash
# Round-4 master TPU queue. Fresh container: runs/ checkpoints and
# /root/corpus did not survive round 3, so every method retrains before
# its Sintel/FC2 eval (VERDICT r3 item 1: the per-method golden-JSON
# suite is the top deliverable). Each train is immediately followed by
# its eval so a failure isolates. Probe-gated, one retry per job
# (memory: axon-tpu-serialization); do NOT edit while running
# (memory: queue-scripts-immutable).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
C=/root/corpus
LOG=runs/queue_r4b.log
echo "=== queue_r4 start $(date)" >> $LOG

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
  wait_healthy || { echo "--- $name SKIPPED (relay never healed) $(date)" >> $LOG; return; }
  echo "--- $name start $(date)" >> $LOG
  timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
  local rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
  sleep 45  # relay client-release settle before the next probe
  if [ $rc -ne 0 ]; then
    sleep 120
    wait_healthy || { echo "--- $name retry SKIPPED $(date)" >> $LOG; return; }
    echo "--- $name RETRY $(date)" >> $LOG
    timeout "$tmo" "$@" >> runs/$name.stdout 2>&1
    echo "--- $name retry exit=$? $(date)" >> $LOG
  fi
}

# 1. Johnson (flagship; also Ruder's bootstrap)
[ -d runs/johnson/002000 ] || \
run train_johnson 4200 python -m vst.cli train-faststyle --method johnson \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 16 --hw 256 256 \
  --out-dir runs/johnson --log-every 50
run eval_johnson 4200 python -m vst.cli eval-sintel --method johnson \
  --n-styles 3 --ckpt-dir runs/johnson --hw 436 1024 \
  --out-dir artifacts/johnson/eval_sintel
run fc2_johnson 4200 python -m vst.cli eval-fc2 --family faststyle \
  --method johnson --ckpt-dir runs/johnson --hw 256 256 --batch-size 8 \
  --data-dir $C --out-dir artifacts/johnson/eval_fc2

# 2-4. remaining single-frame / paired-frame faststyle methods
run train_dumoulin 4200 python -m vst.cli train-faststyle --method dumoulin \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 16 --hw 256 256 \
  --out-dir runs/dumoulin --log-every 50
run eval_dumoulin 4200 python -m vst.cli eval-sintel --method dumoulin \
  --n-styles 3 --ckpt-dir runs/dumoulin --hw 436 1024 \
  --out-dir artifacts/dumoulin/eval_sintel

run train_huang 4200 python -m vst.cli train-faststyle --method huang \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 8 --hw 256 256 \
  --out-dir runs/huang --log-every 50
run eval_huang 4200 python -m vst.cli eval-sintel --method huang \
  --n-styles 3 --ckpt-dir runs/huang --hw 436 1024 \
  --out-dir artifacts/huang/eval_sintel

run train_reconet 4200 python -m vst.cli train-faststyle --method reconet \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 16 --hw 256 256 \
  --out-dir runs/reconet --log-every 50
run eval_reconet 4200 python -m vst.cli eval-sintel --method reconet \
  --n-styles 3 --ckpt-dir runs/reconet --hw 436 1024 \
  --out-dir artifacts/reconet/eval_sintel

# 5. Ruder (Johnson-bootstrapped) + its FC2 metric JSONs (reference
# commits eval_fc2/{johnson,ruder})
run train_ruder 4200 python -m vst.cli train-faststyle --method ruder \
  --n-styles 3 --pre-style-ckpt runs/johnson \
  --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 8 --hw 256 256 \
  --out-dir runs/ruder_r4 --log-every 50
run eval_ruder 4200 python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r4 --hw 436 1024 \
  --out-dir artifacts/ruder/eval_sintel
run fc2_ruder 4200 python -m vst.cli eval-fc2 --family faststyle \
  --method ruder --ckpt-dir runs/ruder_r4 --hw 256 256 --batch-size 8 \
  --data-dir $C --out-dir artifacts/ruder/eval_fc2

# 6. StarGAN v1 (reference commits StarGAN/{eval,sintel_eval})
run train_stargan1 4200 python -m vst.cli train-stargan \
  --num-domains 4 --data-dir $C --device-cache 1000 \
  --steps 2000 --batch-size 16 --hw 128 128 \
  --out-dir runs/stargan1 --log-every 50
run eval_sg1 4200 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel
run fc2_sg1 4200 python -m vst.cli eval-fc2 --family stargan \
  --ckpt-dir runs/stargan1 --hw 256 256 --batch-size 8 \
  --data-dir $C --out-dir artifacts/stargan1/eval_fc2

# 7. StarGAN v2 AdvCon (TCL enabled, λ=100; bf16 policy)
run train_sg2 5400 python -m vst.cli train-stargan2 \
  --num-domains 4 --data-dir $C --device-cache 1000 \
  --steps 1500 --batch-size 8 --hw 256 256 --lambda-tcl 100 \
  --compute-dtype bfloat16 \
  --out-dir runs/stargan2_advcon --log-every 50
run eval_sg2 4200 python -m vst.cli eval-sintel --family stargan2 \
  --ckpt-dir runs/stargan2_advcon --hw 436 1024 \
  --out-dir artifacts/stargan2_advcon/eval_sintel

# 8. CycleGAN sid1 + temporal variant, combined per-style eval
run train_cyclegan 4200 python -m vst.cli train-cyclegan --variant cyclegan \
  --sid 1 --data-dir $C --device-cache 1000 \
  --steps 1500 --batch-size 4 --hw 256 256 \
  --out-dir runs/cyclegan_sid1 --log-every 50
run train_cyclegan_con 4200 python -m vst.cli train-cyclegan \
  --variant cyclegan_con --sid 1 --data-dir $C --device-cache 1000 \
  --steps 1500 --batch-size 4 --hw 256 256 \
  --out-dir runs/cyclegan_con --log-every 50
run eval_cg 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "cyclegan:runs/cyclegan_sid1,cyclegan_con:runs/cyclegan_con" \
  --hw 436 1024 --out-dir artifacts/cyclegan_sid1/eval_sintel

# 9. ConGAN (FusionBlocks, RAFT-in-graph)
run train_congan 4200 python -m vst.cli train-cyclegan --variant congan \
  --sid 1 --data-dir $C --device-cache 1000 \
  --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
  --out-dir runs/congan --log-every 50
run eval_congan 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "congan:runs/congan" --hw 436 1024 \
  --out-dir artifacts/congan/eval_sintel

# 10. MoGAN — full union E+M loss logging (VERDICT r3 item 7) + eval
run train_mogan 4200 python -m vst.cli train-cyclegan --variant mogan \
  --sid 1 --data-dir $C --device-cache 1000 \
  --steps 1500 --batch-size 2 --hw 256 256 --raft-iters 8 \
  --out-dir runs/mogan --log-every 50
cp runs/mogan/losses.txt artifacts/mogan/losses.txt 2>/dev/null
run eval_mogan 4200 python -m vst.cli eval-sintel --family cyclegan \
  --ckpt-dir "mogan:runs/mogan" --hw 436 1024 \
  --out-dir artifacts/mogan/eval_sintel

# 11. RAFT pair-timing artifact regen (current code)
run bench_raft 4200 python -m vst.cli bench-raft \
  --hw 436 1024 --out-dir artifacts/raft

echo "=== queue_r4 done $(date)" >> $LOG
