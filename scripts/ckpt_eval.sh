#!/bin/bash
# CPU-side eval of the latest street_ckpt3 checkpoint while the TPU trains.
# Usage: bash /tmp/ckpt_eval.sh e30   (tag used for dirs/logs)
set -e
TAG=$1
STEP=$(ls /tmp/street_ckpt3 | grep -E '^[0-9]+$' | sort -n | tail -1)
CK=/tmp/eval_ck_$TAG
rm -rf $CK && mkdir -p $CK
cp -r /tmp/street_ckpt3/$STEP $CK/
cd /root/repo
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
nice -n 19 python -m deepi2p_tpu.eval.cli dump --dataset synthetic \
  --synthetic-scene street --points 4096 --nodes 64 --img-h 96 --img-w 160 \
  --checkpoint $CK --out /tmp/dump_$TAG --dump-len 24 --batch-size 8 \
  --save-probs 2>&1 | tail -2
nice -n 19 python -m deepi2p_tpu.eval.cli solve --data-dir /tmp/dump_$TAG \
  --method frustum --img-h 96 --img-w 160 --n-inits 48 --max-iter 32 \
  2>&1 | tail -20
echo "ckpt step $STEP tagged $TAG done"
