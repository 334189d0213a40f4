#!/bin/bash
# Round-3 training queue: the five methods without convergence runs
# (VERDICT r2 "missing #2") + a real Ruder run. Serialized — one TPU
# process at a time. Mirrors the round-2 Johnson recipe (b16, 256²,
# HBM-resident corpus cache).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
C=/root/corpus
LOG=runs/queue_r3.log
echo "=== queue start $(date)" >> $LOG

run() {
  name=$1; shift
  echo "--- $name start $(date)" >> $LOG
  timeout 4200 "$@" >> runs/$name.stdout 2>&1
  rc=$?
  echo "--- $name exit=$rc $(date)" >> $LOG
}

run dumoulin python -m vst.cli train-faststyle --method dumoulin \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 16 --hw 256 256 \
  --out-dir runs/dumoulin --log-every 50

run reconet python -m vst.cli train-faststyle --method reconet \
  --n-styles 3 --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 16 --hw 256 256 \
  --out-dir runs/reconet --log-every 50

run ruder python -m vst.cli train-faststyle --method ruder \
  --n-styles 3 --pre-style-ckpt runs/johnson \
  --data-dir $C/DATAFiles --device-cache 2000 \
  --steps 2000 --batch-size 8 --hw 256 256 \
  --out-dir runs/ruder_r3 --log-every 50

run cyclegan_con python -m vst.cli train-cyclegan --variant cyclegan_con \
  --sid 1 --data-dir $C --device-cache 2000 \
  --steps 2000 --batch-size 4 --hw 256 256 \
  --out-dir runs/cyclegan_con --log-every 50

run congan python -m vst.cli train-cyclegan --variant congan \
  --sid 1 --data-dir $C --device-cache 2000 \
  --steps 2000 --batch-size 4 --hw 256 256 --raft-iters 12 \
  --out-dir runs/congan --log-every 50

run mogan python -m vst.cli train-cyclegan --variant mogan \
  --sid 1 --data-dir $C --device-cache 2000 \
  --steps 1500 --batch-size 4 --hw 256 256 --raft-iters 12 \
  --out-dir runs/mogan --log-every 50

echo "=== queue done $(date)" >> $LOG
