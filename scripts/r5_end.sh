#!/bin/bash
# Round-5 end-of-session chain: runs AFTER chain 11 frees the relay.
# Highest-value first (VERDICT r4 #10): the full green suite is the one
# record the round must not end without; bench + dryrun follow.
# One python at a time (relay rules; CLAUDE.md).
cd /root/repo
LOG=/tmp/r5_end.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: full CPU suite at HEAD ($(git rev-parse --short HEAD))"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 5400 \
  python -m pytest tests/ -q > /tmp/r5_end_suite.log 2>&1
say "suite rc=$? $(tail -1 /tmp/r5_end_suite.log)"

say "step 2: clean bench on the idle relay"
timeout 2400 python bench.py > /tmp/r5_end_bench.log 2>&1
say "bench rc=$? $(grep -E '^\{' /tmp/r5_end_bench.log | tail -1)"

say "step 3: driver-exact dryrun_multichip(8)"
timeout 1200 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
  > /tmp/r5_end_dryrun.log 2>&1
say "dryrun rc=$? $(tail -1 /tmp/r5_end_dryrun.log)"

say "R5_END_DONE"
