#!/bin/bash
# Round-5 chain 5: the image-density fix (img_render_n) applied to the
# honest N=20480 table — the round-5 tail probes showed the n20k
# transfer gap was the OOD-dense splat image, not points-per-node, and
# that SubsampleEnsemble + trained-density image restores native
# accuracy (scripts/probe_ens_tail.py: worst-8 samples 0.637 -> 0.946).
# Highest-value first (VERDICT r4 #10).  One python at a time.
cd /root/repo
LOG=/tmp/r5_chain5.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: n20k ensemble headline with img_render_n=8192"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --img-render-n 8192 \
  --pairs 48 --seeds 5 \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens2 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens2.json \
  > /tmp/r5_headline_n20k_ens2.log 2>&1
say "ens2 headline rc=$? $(tail -1 /tmp/r5_headline_n20k_ens2.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens2.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k ensemble headline at trained image density

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 2: conversion sweep on the ens2 dump"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens2 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens2.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  > /tmp/r5_sweep_n20k_ens2.log 2>&1
say "ens2 sweep rc=$? $(tail -1 /tmp/r5_sweep_n20k_ens2.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens2.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k ensemble conversion sweep at trained image density

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 3: structured-noise gate triage (pallas vs xla backends x 4 keys)"
timeout 3600 python scripts/probe_gate_onchip.py \
  > /tmp/r5_gate_triage.log 2>&1
say "gate triage rc=$? $(tail -1 /tmp/r5_gate_triage.log)"

say "step 4: on-chip re-run of the renderer parity module (precision fix)"
DEEPI2P_TEST_PLATFORM=axon timeout 3600 python -m pytest \
  tests/test_synthetic_jax.py -q > /tmp/r5_onchip_synth2.log 2>&1
say "on-chip synth tests rc=$? $(tail -1 /tmp/r5_onchip_synth2.log)"

say "step 5: clean bench at HEAD"
timeout 3600 python bench.py > /tmp/r5_bench2.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r5_bench2.log)"

say "R5_CHAIN5_DONE — chip is free"
