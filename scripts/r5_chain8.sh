#!/bin/bash
# Round-5 chain 8: cover-repeat scaling — repeats=3 lifted dump coarse
# 0.9355 -> 0.9592 and frustum argmax 0.354 -> 0.508; probe repeats=6 for
# the asymptote (context-noise variance halves again).  One python at a
# time (CLAUDE.md relay rules).
cd /root/repo
LOG=/tmp/r5_chain8.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: n20k dump at classify-repeats=6 (ens5)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 6 --img-render-n 8192 \
  --pairs 48 --dump-only \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens5 \
  > /tmp/r5_dump_ens5.log 2>&1
say "dump rc=$? $(grep coarse_accuracy /tmp/r5_dump_ens5.log | tail -1)"

say "step 2: headline on the ens5 dump"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 6 --img-render-n 8192 \
  --pairs 48 --seeds 5 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens5 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens5.json \
  > /tmp/r5_headline_ens5.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r5_headline_ens5.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens5.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline at classify-repeats=6

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: tuned-row sweep on ens5 (threshold grid shifted up)"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens5 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens5.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  --thresholds 0.45 0.5 0.55 --out-weights 1.0 \
  --skip-confidence --skip-anatomy \
  > /tmp/r5_sweep_ens5.log 2>&1
say "sweep rc=$? $(tail -1 /tmp/r5_sweep_ens5.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens5.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k tuned-row sweep at classify-repeats=6

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "R5_CHAIN8_DONE — chip is free"
