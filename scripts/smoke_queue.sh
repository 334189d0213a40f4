#!/bin/bash
# CPU smoke test of the round-3 training queue commands (2 steps, tiny hw)
# before committing TPU time. Mirrors scripts/train_queue.sh flags.
set -x
cd /root/repo
C=/root/corpus
for m in dumoulin reconet; do
  timeout 600 python -m vst.cli train-faststyle --platform cpu --method $m \
    --n-styles 3 --data-dir $C/DATAFiles --steps 2 --batch-size 2 \
    --hw 64 64 --out-dir /tmp/smoke/$m --log-every 1 \
    || echo "FAIL $m"
done
timeout 600 python -m vst.cli train-faststyle --platform cpu --method ruder \
  --n-styles 3 --pre-style-ckpt runs/johnson --data-dir $C/DATAFiles \
  --steps 2 --batch-size 2 --hw 64 64 --out-dir /tmp/smoke/ruder \
  --log-every 1 || echo "FAIL ruder"
for v in cyclegan_con congan mogan; do
  timeout 900 python -m vst.cli train-cyclegan --platform cpu --variant $v \
    --sid 1 --data-dir $C --steps 2 --batch-size 2 --hw 64 64 \
    --raft-iters 4 --out-dir /tmp/smoke/$v --log-every 1 \
    || echo "FAIL $v"
done
echo SMOKE-DONE
