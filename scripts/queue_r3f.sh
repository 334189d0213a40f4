#!/bin/bash
# Round-3 session-4 queue, wave 2: regenerate the method checkpoints that
# did not survive the container (only runs/johnson was retrained today)
# and commit the reference-matching Sintel eval JSON set — the reference
# commits eval_sintel for johnson/dumoulin/huang/ruder plus StarGAN
# sintel_eval (BASELINE.md table). Each train is followed by its eval so
# a failure isolates. Waits for queue_r3e's bash ($1) to exit first.
# Probe-gated; one TPU process at a time; do NOT edit while running.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
C=/root/corpus
LOG=runs/queue_r3f.log
echo "=== queue_r3f start $(date)" >> $LOG

WPID=${1:-0}
while kill -0 "$WPID" 2>/dev/null; do
  sleep 30
done
echo "--- queue_r3e ($WPID) drained $(date)" >> $LOG

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

run train_ruder 4200 python -m vst.cli train-faststyle --method ruder \
  --n-styles 3 --pre-style-ckpt runs/johnson \
  --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 8 --hw 256 256 \
  --out-dir runs/ruder_r3 --log-every 50
run eval_ruder 4200 python -m vst.cli eval-sintel --method ruder \
  --n-styles 3 --ckpt-dir runs/ruder_r3 --hw 436 1024 \
  --out-dir artifacts/ruder/eval_sintel

run train_stargan1 4200 python -m vst.cli train-stargan \
  --num-domains 4 --data-dir $C --device-cache 1000 \
  --steps 2500 --batch-size 16 --hw 128 128 \
  --out-dir runs/stargan1 --log-every 50
run eval_sg1 4200 python -m vst.cli eval-sintel --family stargan \
  --ckpt-dir runs/stargan1 --hw 436 1024 \
  --out-dir artifacts/stargan1/eval_sintel

echo "=== queue_r3f done $(date)" >> $LOG
