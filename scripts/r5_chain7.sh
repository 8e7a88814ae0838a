#!/bin/bash
# Round-5 chain 7: cover-repeat ensemble (classify-repeats=3) at the full
# reference shape — does averaging independent subset contexts lift the
# 0.9355 dump accuracy, and what does that buy the solver table?
# Ends with a clean bench at HEAD.  One python at a time (CLAUDE.md).
cd /root/repo
LOG=/tmp/r5_chain7.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: n20k dump at classify-repeats=3 (ens4)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 3 --img-render-n 8192 \
  --pairs 48 --dump-only \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens4 \
  > /tmp/r5_dump_ens4.log 2>&1
say "dump rc=$? $(grep coarse_accuracy /tmp/r5_dump_ens4.log | tail -1)"

say "step 2: headline on the ens4 dump"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 3 --img-render-n 8192 \
  --pairs 48 --seeds 5 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens4 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens4.json \
  > /tmp/r5_headline_ens4.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r5_headline_ens4.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens4.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline at classify-repeats=3 (cover-averaged ensemble)

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: focused tuned-row sweep on ens4"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens4 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens4.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  --thresholds 0.4 0.45 0.5 --out-weights 1.0 \
  --skip-confidence --skip-anatomy \
  > /tmp/r5_sweep_ens4.log 2>&1
say "sweep rc=$? $(tail -1 /tmp/r5_sweep_ens4.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens4.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k tuned-row sweep at classify-repeats=3

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 4: clean bench at HEAD"
timeout 3600 python bench.py > /tmp/r5_bench4.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r5_bench4.log)"

say "R5_CHAIN7_DONE — chip is free"
