#!/bin/bash
# Round-5 chain 11: estimated-depth ICP, attacked at its two root causes.
# The ens6 estimated row was 0.0208 vs gt-oracle 0.104/0.375 because
# (a) the DepthNet was trained on SPARSE splat z-buffers — unsupervised
#     on most pixels, and the pseudo cloud samples exactly those pixels —
#     fix: --dense-targets (analytic ray-cast depth, every pixel
#     supervised, scene-exit rays saturate at the 88 m cap), and
# (b) it was trained on 4096-point splat images while the dump renders
#     at img_render_n=8192 — the same image-density transfer bug the
#     classifier had (round-5 session 4) — fix: --points 8192.
# Then the estimated-depth ICP table re-runs on the ens7 dump with the
# saturated sky pixels dropped (--pseudo-max-depth 85).
# One python at a time (relay rules).
cd /root/repo
LOG=/tmp/r5_chain11.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: dense-target DepthNet at the kitti shape (8192-pt images)"
timeout 5400 python -m deepi2p_tpu.train.depth_cli --steps 2000 \
  --scene street --points 8192 --img-h 160 --img-w 512 \
  --dense-targets \
  --checkpoints-dir ckpts/depth_kitti_160x512_dense \
  > /tmp/r5_depth_dense.log 2>&1
say "depth rc=$? $(tail -1 /tmp/r5_depth_dense.log)"

say "step 2: estimated-depth ICP on the ens7 dump (dense net, sky cap)"
timeout 7200 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --seeds 2 --skip-dump \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  --depth-checkpoint ckpts/depth_kitti_160x512_dense \
  --pseudo-max-depth 85 \
  --out-json ckpts/kitti_shape_r4/headline_depth_n20k_ens7.json \
  > /tmp/r5_headline_depth_ens7.log 2>&1
say "depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_ens7.log)"

git add ckpts/kitti_shape_r4/headline_depth_n20k_ens7.json \
        ckpts/depth_kitti_160x512_dense 2>/dev/null
git -c core.hooksPath=/dev/null commit -q -m "estimated-depth ICP from the dense-target DepthNet

No-Verification-Needed: measurement artifacts + trained aux checkpoint" 2>>$LOG

say "R5_CHAIN11_DONE — chip is free"
