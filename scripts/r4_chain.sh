#!/bin/bash
# Round-4 serialized post-training chain.  ONE python at a time (CLAUDE.md:
# a second python can wedge the relay session of a live TPU job) — so this
# chain starts only when the street trainer's retry loop has exited, then
# runs every post-e60 step back-to-back with per-step timeouts and logs
# under /tmp/r4_*.log.  Steps are independent: a red step logs and the
# chain continues (the kitti launch falls back to cold start if the
# partial warm-start check fails).
cd /root/repo
LOG=/tmp/r4_chain.log
say() { echo "=== $1 $(date -u +%H:%M:%SZ)" | tee -a $LOG; }

say "waiting for street train loop (pid $1)"
while kill -0 "$1" 2>/dev/null; do sleep 20; done
say "street trainer exited"
sleep 5

git add ckpts/street_r3/latest.npz PROGRESS.jsonl 2>/dev/null
git commit -q -m "ckpt: street Run B final snapshot (e60 budget complete)

No-Verification-Needed: checkpoint artifact only" && say "ckpt committed"

say "step 1: full CPU suite"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 2700 \
  python -m pytest tests/ -q > /tmp/r4_suite.log 2>&1
say "suite rc=$? tail: $(tail -1 /tmp/r4_suite.log)"

say "step 2: tiny --warm-start-partial CLI check (CPU)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 900 \
  python -m deepi2p_tpu.train.cli --dataset synthetic --synthetic-len 8 \
  --epochs 1 --batch-size 2 --points 256 --nodes 16 --img-h 64 --img-w 96 \
  --checkpoints-dir /tmp/ws_check --log-dir /tmp/ws_check/runs \
  --warm-start ckpts/street_r3/latest.npz --warm-start-partial \
  > /tmp/r4_wscheck.log 2>&1
WS_RC=$?
say "warm-start check rc=$WS_RC"

say "step 3: SWA over the retained street tail (chip)"
timeout 2400 python scripts/swa.py --checkpoints-dir ckpts/street_r3 \
  --out ckpts/street_r3_swa --last 5 --points 4096 --nodes 64 --img-h 96 \
  --img-w 160 --scene street > /tmp/r4_swa.log 2>&1
say "swa rc=$? $(tail -1 /tmp/r4_swa.log)"

say "step 4: headline table on e60 + SWA (chip, shared compile)"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/street_r3/latest.npz \
  --also ckpts/street_r3_swa/latest.npz > /tmp/r4_headline.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r4_headline.log)"

say "step 5: error-structure fixture"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 900 \
  python scripts/characterize_errors.py \
  --dump-dir ckpts/street_r3/headline_dump > /tmp/r4_errors.log 2>&1
say "errors rc=$? $(tail -1 /tmp/r4_errors.log)"

say "step 6: driver dryrun gate (CPU mesh)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 1800 \
  python __graft_entry__.py > /tmp/r4_dryrun.log 2>&1
say "dryrun rc=$? $(tail -1 /tmp/r4_dryrun.log)"

say "step 7: launch kitti-shape training"
LAUNCHER=scripts/train_kitti_shape.sh
if [ "$WS_RC" -ne 0 ]; then
  # never mutate the git-tracked launcher in place (ADVICE r4): edit a
  # /tmp copy, and only drop the exact warm-start FLAG lines
  say "warm-start check FAILED — launching a /tmp copy without warm-start"
  LAUNCHER=/tmp/train_kitti_shape_nows.sh
  sed '/^\s*--warm-start/d' scripts/train_kitti_shape.sh > "$LAUNCHER"
fi
nohup bash "$LAUNCHER" > /tmp/kitti_loop.out 2>&1 &
say "kitti loop pid $!"
say "R4_CHAIN_DONE"
