#!/bin/bash
# Retry the training resume until epoch 59 completes (relay lease recovery).
cd /root/repo
for i in $(seq 1 30); do
  echo "=== retry attempt $i $(date)" >> /tmp/street_train3.log
  timeout 21600 python -m deepi2p_tpu.train.cli --dataset synthetic \
    --synthetic-scene street --fresh-scenes --synthetic-len 16384 \
    --epochs 60 --batch-size 8 --points 4096 --nodes 64 \
    --img-h 96 --img-w 160 --lr-decay-step 15 --val-len 1024 \
    --checkpoints-dir /tmp/street_ckpt3 --log-dir /tmp/street_runs3 \
    --resume >> /tmp/street_train3.log 2>&1
  rc=$?
  echo "=== attempt $i exit=$rc $(date)" >> /tmp/street_train3.log
  if grep -q "epoch 59 done" /tmp/street_train3.log; then
    echo "=== training complete; stopping retry loop" >> /tmp/street_train3.log
    break
  fi
  sleep 90
done
echo "RETRY LOOP DONE"
