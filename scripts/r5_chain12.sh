#!/bin/bash
# Round-5 chain 12 (final session): chain 11's estimated-depth ICP plan,
# adapted to the VM rebuild that destroyed both the ens7 dump (gitignored
# npy) and every previously-trained DepthNet (orbax dirs were gitignored —
# now fixed in .gitignore for this checkpoint).
#   1. dense-target DepthNet at the kitti shape (8192-pt images): ray-cast
#      analytic depth supervises EVERY pixel (the splat z-buffer left ~90%
#      unsupervised), at the dump's image density (the same density-transfer
#      bug the classifier had, round-5 session 4).
#   2. regenerate the ens7 dump (R=12, fine-averaged, images saved) — byte
#      -reproducible seeds, same flags as chain 10.
#   3. estimated-depth ICP rows only (--only-icp) with scene-exit (sky)
#      pixels dropped (--pseudo-max-depth 85; dense targets saturate at the
#      88 m far cap).
# One python at a time (relay rules; CLAUDE.md).
cd /root/repo
LOG=/tmp/r5_chain12.log
say(){ echo "=== $1 $(date -u +%H:%M:%SZ)" >> $LOG; }

say "step 1: dense-target DepthNet at the kitti shape (8192-pt images)"
timeout 3300 python -m deepi2p_tpu.train.depth_cli --steps 2000 \
  --scene street --points 8192 --img-h 160 --img-w 512 \
  --dense-targets \
  --checkpoints-dir ckpts/depth_kitti_160x512_dense \
  > /tmp/r5_depth_dense.log 2>&1
say "depth rc=$? $(tail -1 /tmp/r5_depth_dense.log)"

say "step 2: regenerate the ens7 dump (R=12, fine-averaged, with images)"
timeout 3000 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --dump-only --save-images \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  > /tmp/r5_dump_ens7b.log 2>&1
say "dump rc=$? $(grep coarse_accuracy /tmp/r5_dump_ens7b.log | tail -1)"

say "step 3: estimated-depth ICP rows (dense net, sky cap 85 m)"
timeout 2400 python scripts/repro_headline.py \
  --checkpoint ckpts/kitti_shape_r4/latest.npz \
  --preset kitti --points 20480 --nodes 128 --img-h 160 --img-w 512 \
  --classify-n 8192 --classify-repeats 12 --img-render-n 8192 \
  --pairs 48 --seeds 2 --skip-dump --only-icp \
  --dump-dir ckpts/kitti_shape_r4/headline_dump_n20k_ens7 \
  --depth-checkpoint ckpts/depth_kitti_160x512_dense \
  --pseudo-max-depth 85 \
  --out-json ckpts/kitti_shape_r4/headline_depth_n20k_ens7.json \
  > /tmp/r5_headline_depth_ens7.log 2>&1
say "depth headline rc=$? $(tail -1 /tmp/r5_headline_depth_ens7.log)"

git add -A ckpts/kitti_shape_r4/headline_depth_n20k_ens7.json \
        ckpts/depth_kitti_160x512_dense 2>>$LOG
git -c core.hooksPath=/dev/null commit -q \
  -m "estimated-depth ICP from the dense-target DepthNet (chain 12)" 2>>$LOG

say "R5_CHAIN12_DONE — chip is free"
