#!/bin/bash
# Round 5: adapt the kitti-shape classifier to the reference's FULL point
# count.  The 32-epoch kitti-shape run trained at N=8192 (2x samples/s;
# quality was sample-bound in the round-4 window) and hits val coarse
# 0.946 there — but evaluated at the reference's N=20480 the accuracy
# drops to 0.822: the SO-Net node statistics (points-per-node 64 -> 160)
# shift under the pointwise heads.  A short fine-tune AT N=20480
# (warm-start strict from the N=8192 snapshot — the model is pointwise,
# so every param shape is identical; step carries, keeping the decayed
# lr) re-centres those statistics.  Reference: train N is 20480
# (kitti/options.py input_pt_num).
cd /root/repo
for i in $(seq 1 20); do
  [ -f /tmp/stop_kitti ] && { echo "=== stop flag (pre-launch)" >> /tmp/kitti_n20k.log; break; }
  echo "=== attempt $i $(date -u +%H:%M:%SZ)" >> /tmp/kitti_n20k.log
  timeout 5200 python -m deepi2p_tpu.train.cli --dataset synthetic \
    --synthetic-preset kitti --synthetic-scene street --fresh-scenes \
    --synthetic-len 8192 --epochs 64 --batch-size 8 \
    --points 20480 --nodes 128 --img-h 160 --img-w 512 \
    --lr-decay-step 10 --val-len 512 \
    --steps-per-dispatch 8 --ckpt-every 1000 --device-data \
    --checkpoints-dir /root/repo/ckpts/kitti_shape_n20k \
    --log-dir /root/repo/ckpts/kitti_shape_n20k/runs \
    --warm-start /root/repo/ckpts/kitti_shape_r4/latest.npz \
    --resume >> /tmp/kitti_n20k.log 2>&1
  rc=$?
  echo "=== attempt $i exit=$rc $(date -u +%H:%M:%SZ)" >> /tmp/kitti_n20k.log
  if grep -q "epoch 63 done" /tmp/kitti_n20k.log; then
    echo "=== training complete" >> /tmp/kitti_n20k.log
    break
  fi
  [ -f /tmp/stop_kitti ] && { echo "=== stop flag" >> /tmp/kitti_n20k.log; break; }
  sleep 30
done
echo "KITTI_N20K_LOOP_DONE"
