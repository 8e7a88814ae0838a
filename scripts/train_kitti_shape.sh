#!/bin/bash
# Round 4, VERDICT #3: a REFERENCE-SHAPED run — KITTI geometry 160x512,
# fine grid 5x16 = 80 cells (multimodal_classifier.py:104-112), N=20480 —
# to demonstrate (a) the fine head at a real grid and (b) prediction-
# driven PnP success, which is geometry-starved at the 96x160 config's
# 3x5 grid (registration_pnp.py:95-148).
# Launched AFTER the street run finishes; smaller epoch (8192 samples) +
# faster lr decay to fit the remaining chip window.  --device-data keeps
# it compute-bound at this much larger shape.
# N=8192 for TRAINING (2x the samples/s of the reference's 20480 —
# quality is sample-bound in the remaining window); the dump/eval runs
# at the reference's N=20480 (the classifier is pointwise-over-points,
# so the eval shape recompiles but the weights transfer; what PnP
# consumes is the 160x512 image and its 5x16=80-cell fine grid,
# registration_pnp.py:95-148).
cd /root/repo
for i in $(seq 1 20); do
  # stop flag checked BEFORE launching (not only after an attempt exits):
  # a stop request arriving during the inter-attempt sleep must not win
  # one more full training window (ADVICE r4)
  [ -f /tmp/stop_kitti ] && { echo "=== stop flag (pre-launch)" >> /tmp/kitti_shape.log; break; }
  echo "=== attempt $i $(date -u +%H:%M:%SZ)" >> /tmp/kitti_shape.log
  timeout 5200 python -m deepi2p_tpu.train.cli --dataset synthetic \
    --synthetic-preset kitti --synthetic-scene street --fresh-scenes \
    --synthetic-len 8192 --epochs 32 --batch-size 8 \
    --points 8192 --nodes 128 --img-h 160 --img-w 512 \
    --lr-decay-step 10 --val-len 512 \
    --steps-per-dispatch 8 --ckpt-every 1000 --device-data \
    --checkpoints-dir /root/repo/ckpts/kitti_shape_r4 \
    --log-dir /root/repo/ckpts/kitti_shape_r4/runs \
    --warm-start /root/repo/ckpts/street_r3/latest.npz \
    --warm-start-partial \
    --resume >> /tmp/kitti_shape.log 2>&1
  rc=$?
  echo "=== attempt $i exit=$rc $(date -u +%H:%M:%SZ)" >> /tmp/kitti_shape.log
  if grep -q "epoch 31 done" /tmp/kitti_shape.log; then
    echo "=== training complete" >> /tmp/kitti_shape.log
    break
  fi
  [ -f /tmp/stop_kitti ] && { echo "=== stop flag" >> /tmp/kitti_shape.log; break; }
  sleep 30
done
echo "KITTI_SHAPE_LOOP_DONE"
