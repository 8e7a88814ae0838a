#!/bin/bash
# Round-5 chain 4: the depth-chain steps lost when chain2's step-6 depth
# trainer stalled (killed by explicit PID per CLAUDE.md) plus chain2's
# on-chip test step.  Waits for r5_chain3.sh; one python at a time.
cd /root/repo
LOG=/tmp/r5_chain4.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

PREV=$(cat /tmp/r5_chain3.pid 2>/dev/null)
say "waiting on chain3 pid=$PREV"
while [ -n "$PREV" ] && kill -0 "$PREV" 2>/dev/null; do sleep 60; done
say "chain3 done — relay free"

say "step 1: depth net at street geometry (96x160) — chain2 step-6 redo"
timeout 3600 python -m deepi2p_tpu.train.depth_cli --steps 2000 \
  --scene street --points 4096 --img-h 96 --img-w 160 \
  --checkpoints-dir ckpts/depth_street_96x160 > /tmp/r5_depth_street.log 2>&1
say "depth street rc=$? $(tail -1 /tmp/r5_depth_street.log)"

say "step 2: ICP from ESTIMATED depth on the street e60 dump (VERDICT r4 #6)"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/street_r3/latest.npz \
  --points 4096 --nodes 64 --img-h 96 --img-w 160 \
  --pairs 48 --seeds 3 --save-images \
  --depth-checkpoint ckpts/depth_street_96x160 \
  --dump-dir ckpts/street_r3/headline_dump_img \
  --out-json ckpts/street_r3/headline_depth.json \
  > /tmp/r5_headline_depth_street.log 2>&1
say "street depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_street.log)"

git add ckpts/street_r3/headline_depth.json ckpts/depth_street_96x160 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "estimated-depth ICP row (street e60) + depth checkpoint

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: on-chip precision pass (VERDICT r4 #9; chain2 step-9 redo)"
DEEPI2P_TEST_PLATFORM=axon timeout 5400 python -m pytest \
  tests/test_frustum.py tests/test_synthetic_jax.py -q \
  > /tmp/r5_onchip_tests.log 2>&1
say "on-chip tests rc=$? $(tail -1 /tmp/r5_onchip_tests.log)"

say "step 4 (stretch): depth net at kitti geometry + estimated-depth ICP n8192"
timeout 3600 python -m deepi2p_tpu.train.depth_cli --steps 2000 \
  --scene street --points 4096 --img-h 160 --img-w 512 \
  --checkpoints-dir ckpts/depth_kitti_160x512 > /tmp/r5_depth_kitti.log 2>&1
say "depth kitti rc=$? $(tail -1 /tmp/r5_depth_kitti.log)"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 8192 --nodes 128 --img-h 160 --img-w 512 \
  --pairs 48 --seeds 3 --save-images \
  --depth-checkpoint ckpts/depth_kitti_160x512 \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n8192_img \
  --out-json ckpts/kitti_shape_r4/headline_depth_n8192.json \
  > /tmp/r5_headline_depth_kitti.log 2>&1
say "kitti depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_kitti.log)"

git add ckpts/kitti_shape_r4/headline_depth_n8192.json \
        ckpts/depth_kitti_160x512 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "estimated-depth ICP row at the kitti shape + depth checkpoint

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "R5_CHAIN4_DONE — chip is free"
