"""Where does solve success turn on, in units of REAL classifier errors?

Loads a real prediction dump and interpolates between the classifier's
coarse_pred and the GT labels: at cleanup fraction f, a random f of the
erroneous points are corrected (preserving the spatial structure of the
remaining errors — unlike synthetic noise, which round-3 showed is far
too friendly).  The success-vs-f curve gives the quality bar for the
training run in the error geometry that actually matters.

CPU-safe:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_cleanup.py \
               --data-dir /tmp/street_dump_e9 --n 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.eval.dump import load_dump, list_dump_prefixes
from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--img-h", type=int, default=96)
    p.add_argument("--img-w", type=int, default=160)
    p.add_argument("--n", type=int, default=16, help="pairs to solve")
    p.add_argument("--n-inits", type=int, default=48)
    p.add_argument("--max-iter", type=int, default=24)
    p.add_argument("--fracs", default="0.0,0.25,0.5,0.75,0.9,1.0")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    prefixes = list_dump_prefixes(args.data_dir)[:args.n]
    dumps = [load_dump(args.data_dir, pre) for pre in prefixes]
    pc = jnp.asarray(np.stack([d["pc"] for d in dumps]), jnp.float32)
    K = jnp.asarray(np.stack([d["K"] for d in dumps]), jnp.float32)
    P_gt = np.stack([d["P"] for d in dumps])
    pred = np.stack([d["coarse_pred"] for d in dumps])
    gt = np.stack([d["coarse_label"] for d in dumps])

    rng = np.random.default_rng(args.seed)
    for f in [float(x) for x in args.fracs.split(",")]:
        # correct a random f of the erroneous points, keep the rest
        wrong = pred != gt
        fix = wrong & (rng.uniform(size=pred.shape) < f)
        labels = np.where(fix, gt, pred)
        err = float((labels != gt).mean())
        rec = float(((labels == 1) & (gt == 1)).sum() / max((gt == 1).sum(), 1))
        t0 = time.time()
        P_pred, _ = solve_frustum_batch(
            pc, jnp.asarray(labels.astype(np.int32)), K,
            H=args.img_h, W=args.img_w, rng=jax.random.PRNGKey(args.seed),
            n_inits=args.n_inits, max_iter=args.max_iter)
        P_pred = np.asarray(P_pred)
        diffs = [pose_diff_np(P_pred[i], P_gt[i]) for i in range(len(dumps))]
        rte = np.array([d[0] for d in diffs])
        rre = np.array([d[1] for d in diffs])
        succ = float(np.mean((rte < 2.0) & (rre < 5.0)))
        print(json.dumps({"cleanup": f, "err": round(err, 4),
                          "recall": round(rec, 3), "success": round(succ, 3),
                          "rte_med": round(float(np.median(rte)), 2),
                          "rre_med": round(float(np.median(rre)), 1),
                          "sec": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
