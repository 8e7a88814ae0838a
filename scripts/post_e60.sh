#!/bin/bash
# Round 4: serialized post-training sequence for the street Run B e60
# checkpoint.  Run ONLY when no other python holds the relay (CLAUDE.md:
# one python process per chip; even env-guarded CPU python has frozen a
# live TPU job).  Runs on the CPU backend: the solver-table numbers are
# solver-quality evidence (round-3 methodology), and keeping the chip
# free lets the KITTI-shaped run start the moment this finishes.
#
#   bash scripts/post_e60.sh            # headline + error fixture
set -e
cd /root/repo
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

# 1. headline table from the committed npz (dump seed 7, 48 pairs,
#    5 solver seeds at the reference's 60-init budget) -> headline.json
python scripts/repro_headline.py --checkpoint ckpts/street_r3/latest.npz \
  2>&1 | tee /tmp/post_e60_headline.log

# 2. measured error structure of the fresh dump -> committed gate fixture
python scripts/characterize_errors.py \
  --dump-dir ckpts/street_r3/headline_dump \
  2>&1 | tee /tmp/post_e60_errors.log

echo "POST_E60_DONE"
