#!/bin/bash
# Round 4: finish Run B (street fresh-scenes) to the 60-epoch budget.
# Resumes the repo-persisted orbax state (ckpts/street_r3); --epochs is a
# TOTAL budget, lr halves every 15 epochs.
# K=8 steps per dispatch amortizes the relay's fixed per-dispatch latency
# (engine._train_scan_impl; statistically equivalent to per-step, see
# tests/test_train.py::test_train_step_scan_matches_loop).
# --device-data: round-4 change — batches are generated ON the chip
# (data/synthetic_jax.py); the numpy generator host-bound the epoch at
# ~525 s while the chip idled 84% (measured), device generation makes
# the epoch compute-bound (~100 s expected).
# Bounded windows + retry: a stalled relay session never wedges the run.
cd /root/repo
for i in $(seq 1 40); do
  echo "=== attempt $i $(date -u +%H:%M:%SZ)" >> /tmp/street_train4.log
  timeout 5200 python -m deepi2p_tpu.train.cli --dataset synthetic \
    --synthetic-scene street --fresh-scenes --synthetic-len 16384 \
    --epochs 60 --batch-size 8 --points 4096 --nodes 64 \
    --img-h 96 --img-w 160 --lr-decay-step 15 --val-len 1024 \
    --steps-per-dispatch 8 --ckpt-every 1000 --device-data \
    --checkpoints-dir /root/repo/ckpts/street_r3 \
    --log-dir /root/repo/ckpts/street_r3/runs \
    --warm-start /root/repo/ckpts/street_r3/latest.npz \
    --resume >> /tmp/street_train4.log 2>&1
  rc=$?
  echo "=== attempt $i exit=$rc $(date -u +%H:%M:%SZ)" >> /tmp/street_train4.log
  if grep -q "epoch 59 done" /tmp/street_train4.log; then
    echo "=== training complete" >> /tmp/street_train4.log
    break
  fi
  [ -f /tmp/stop_train4 ] && { echo "=== stop flag" >> /tmp/street_train4.log; break; }
  sleep 30
done
echo "TRAIN_R4_LOOP_DONE"
