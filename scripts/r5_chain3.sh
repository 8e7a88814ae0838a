#!/bin/bash
# Round-5 follow-on chain: waits for r5_chain2.sh to release the relay,
# then runs the NEW subsample-ensemble headline at the full reference
# N=20480 (eval.dump.SubsampleEnsemble, this session) and its focused
# conversion sweep.  One python process at a time (CLAUDE.md relay rule);
# artifacts commit as they land (VM rebuilds wipe /tmp).
cd /root/repo
LOG=/tmp/r5_chain3.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

PREV=$(cat /tmp/r5_chain2.pid 2>/dev/null)
say "waiting on chain2 pid=$PREV"
while [ -n "$PREV" ] && kill -0 "$PREV" 2>/dev/null; do sleep 60; done
say "chain2 done — relay free"

say "step A: CPU gate for the ensemble path (new code this session)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1800 python -m pytest \
  tests/test_dump_ensemble.py \
  "tests/test_cli.py::test_eval_cli_dump_classify_n" -q \
  > /tmp/r5_ens_gate.log 2>&1
GATE=$?
say "gate rc=$GATE $(tail -1 /tmp/r5_ens_gate.log)"

if [ "$GATE" -eq 0 ]; then
  say "step B: ensemble headline — N=20480 dump, classify-n 8192 (5 seeds)"
  timeout 7200 python scripts/repro_headline.py \
    --checkpoint ckpts/kitti_shape_r4/latest.npz \
    --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
    --classify-n 8192 --pairs 48 --seeds 5 \
    --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens \
    --out-json ckpts/kitti_shape_r4/headline_n20k_ensemble.json \
    > /tmp/r5_headline_n20k_ens.log 2>&1
  say "ensemble headline rc=$? $(tail -1 /tmp/r5_headline_n20k_ens.log)"

  git add ckpts/kitti_shape_r4/headline_n20k_ensemble.json 2>/dev/null
  git -c core.hooksPath=/dev/null commit -q -m "n20k subsample-ensemble headline artifact

No-Verification-Needed: measurement artifact only" 2>>$LOG

  say "step C: focused conversion sweep on the ensemble dump"
  timeout 5400 python scripts/sweep_conversion.py \
    --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens \
    --out-json ckpts/kitti_shape_r4/conversion_sweep_n20k_ens.json \
    --img-h 160 --img-w 512 --skip-anatomy --skip-confidence \
    --thresholds 0.4 0.45 0.5 --out-weights 1.0 \
    > /tmp/r5_sweep_n20k_ens.log 2>&1
  say "ensemble sweep rc=$? $(tail -1 /tmp/r5_sweep_n20k_ens.log)"

  git add ckpts/kitti_shape_r4/conversion_sweep_n20k_ens.json 2>/dev/null
  git -c core.hooksPath=/dev/null commit -q -m "n20k ensemble conversion sweep artifact

No-Verification-Needed: measurement artifact only" 2>>$LOG
else
  say "gate FAILED — skipping chip steps B/C"
fi

say "step D: fast-tier suite at HEAD (slow marks validation data)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 2400 python -m pytest \
  tests/ -q -m "not slow" > /tmp/r5_fast_suite.log 2>&1
say "fast suite rc=$? $(tail -1 /tmp/r5_fast_suite.log)"

say "R5_CHAIN3_DONE — chip is free"
