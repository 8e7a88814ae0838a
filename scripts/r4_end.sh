#!/bin/bash
# Round-4 SESSION-END sequence.  Usage: bash scripts/r4_end.sh <kitti_loop_pid>
#
# Stops the kitti-shape training loop cleanly (stop flag + explicit-PID
# kill of the current window — never pattern kills), then runs the
# remaining chip work serialized: the reference-shaped headline table
# (dump at the reference's N=20480 / 160x512 / 80-cell fine grid, the
# PnP row VERDICT r3 #3 asks for), a bench re-verify, and the round-3
# pending probes (train-step backward ablation, 3D quality table) if
# the window allows.  Leaves the chip FREE at the end — the driver's
# bench.py run blocks on the relay if any trainer is still alive.
cd /root/repo
LOG=/tmp/r4_end.log
say() { echo "=== $1 $(date -u +%H:%M:%SZ)" | tee -a $LOG; }

LOOP_PID=$1
say "stopping kitti loop pid $LOOP_PID"
touch /tmp/stop_kitti
# kill the current training window by explicit pid: children of the loop
# (timeout) and grandchildren (python), found by ppid walk — deterministic,
# no pattern matching (CLAUDE.md: never pkill -f)
for p in $(ps -o pid= --ppid "$LOOP_PID" 2>/dev/null); do
  for q in $(ps -o pid= --ppid "$p" 2>/dev/null); do
    kill "$q" 2>/dev/null && say "killed python $q"
  done
  kill "$p" 2>/dev/null && say "killed timeout $p"
done
while kill -0 "$LOOP_PID" 2>/dev/null; do sleep 5; done
say "kitti loop exited"
rm -f /tmp/stop_kitti
sleep 5

git add ckpts/kitti_shape_r4 2>/dev/null
git commit -q -m "ckpt: kitti-shape run snapshot at session end

No-Verification-Needed: checkpoint artifact only" && say "kitti ckpt committed"

say "step 1: kitti-shape headline at reference N=20480 (chip)"
timeout 5400 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --pairs 48 --seeds 3 > /tmp/r4_kitti_headline.log 2>&1
say "kitti headline rc=$? $(tail -1 /tmp/r4_kitti_headline.log)"

say "step 2: bench re-verify (chip)"
timeout 2400 python bench.py > /tmp/r4_bench.log 2>&1
say "bench rc=$? $(tail -1 /tmp/r4_bench.log)"

say "step 3: perf_probe10 backward ablation (chip, round-3 pending)"
timeout 1800 python scripts/perf_probe10.py > /tmp/r4_probe10.log 2>&1
say "probe10 rc=$? $(tail -2 /tmp/r4_probe10.log | head -1)"

say "step 4: 3D quality table on-chip rerun (round-3 pending)"
timeout 1800 python scripts/quality_table_3d.py > /tmp/r4_table3d.log 2>&1
say "table3d rc=$? $(tail -1 /tmp/r4_table3d.log)"

say "R4_END_DONE — chip is free"
