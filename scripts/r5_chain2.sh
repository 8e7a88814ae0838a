#!/bin/bash
# Round-5 serialized chip chain (one python process at a time — the relay
# admits a single client; CLAUDE.md).  Highest-value work first
# (VERDICT r4 #10): clean bench re-verify, then the N=20480 fine-tune
# that unlocks the honest reference-shape table, then the eval ladder.
# Artifacts are committed as they land (VM rebuilds wipe /tmp; round-3
# lesson).
cd /root/repo
LOG=/tmp/r5_chain2.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: clean bench re-verify on idle relay (VERDICT r4 #5)"
timeout 3600 python bench.py > /tmp/r5_bench_verify.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r5_bench_verify.log)"

say "step 2: N=20480 fine-tune (VERDICT r4 #1 leftover)"
bash scripts/finetune_n20480.sh >> $LOG 2>&1
say "finetune loop done: $(tail -2 /tmp/kitti_n20k.log | head -1)"

git add ckpts/kitti_shape_n20k 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "ckpt: N=20480 fine-tune from the kitti-shape snapshot

No-Verification-Needed: checkpoint artifact only" 2>>$LOG
say "n20k ckpt committed"

say "step 3: honest N=20480 headline (5-seed) + images for the depth chain"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_n20k/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --pairs 48 --seeds 5 --save-images > /tmp/r5_headline_n20k.log 2>&1
say "headline n20k rc=$? $(tail -1 /tmp/r5_headline_n20k.log)"

say "step 4: conversion + margin sweep on the n20k dump"
timeout 9000 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_n20k/headline_dump \
  --out-json ckpts/kitti_shape_n20k/conversion_sweep.json \
  --img-h 160 --img-w 512 --skip-anatomy \
  --edge-margins 0 8 16 24 > /tmp/r5_sweep_n20k.log 2>&1
say "sweep n20k rc=$? $(tail -1 /tmp/r5_sweep_n20k.log)"

git add ckpts/kitti_shape_n20k 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline + conversion sweep artifacts

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 5: margin sweep on the committed n8192 dump (new lever, round-5)"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n8192 \
  --out-json ckpts/kitti_shape_r4/margin_sweep_n8192.json \
  --img-h 160 --img-w 512 --only-margins \
  --edge-margins 0 4 8 16 32 \
  --anchor-threshold 0.45 --anchor-outside-weight 1.0 \
  > /tmp/r5_margin_n8192.log 2>&1
say "margin n8192 rc=$? $(tail -1 /tmp/r5_margin_n8192.log)"

say "step 6: depth net at street geometry (96x160) for the e60 ICP chain"
timeout 3600 python -m deepi2p_tpu.train.depth_cli --steps 2000 \
  --scene street --points 4096 --img-h 96 --img-w 160 \
  --checkpoints-dir ckpts/depth_street_96x160 > /tmp/r5_depth_street.log 2>&1
say "depth street rc=$? $(tail -1 /tmp/r5_depth_street.log)"

say "step 7: ICP from ESTIMATED depth on the street e60 dump (VERDICT r4 #6)"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/street_r3/latest.npz \
  --points 4096 --nodes 64 --img-h 96 --img-w 160 \
  --pairs 48 --seeds 3 --save-images \
  --depth-checkpoint ckpts/depth_street_96x160 \
  --dump-dir ckpts/street_r3/headline_dump_img \
  --out-json ckpts/street_r3/headline_depth.json \
  > /tmp/r5_headline_depth_street.log 2>&1
say "street depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_street.log)"

say "step 8: depth net at kitti geometry (160x512) + estimated-depth ICP on n8192"
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

git add ckpts/street_r3/headline_depth.json \
        ckpts/kitti_shape_r4/headline_depth_n8192.json \
        ckpts/kitti_shape_r4/margin_sweep_n8192.json \
        ckpts/depth_street_96x160 ckpts/depth_kitti_160x512 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "estimated-depth ICP rows + margin sweep artifacts

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 9: on-chip precision pass for round-5 f32 paths (VERDICT r4 #9)"
DEEPI2P_TEST_PLATFORM=axon timeout 5400 python -m pytest \
  tests/test_frustum.py tests/test_synthetic_jax.py -q \
  > /tmp/r5_onchip_tests.log 2>&1
say "on-chip tests rc=$? $(tail -1 /tmp/r5_onchip_tests.log)"

say "R5_CHAIN2_DONE — chip is free"
