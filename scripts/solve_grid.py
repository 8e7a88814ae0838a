"""Operating-point grid for prediction-driven registration.

Sweeps (inside_threshold x outside_weight) over a REAL prediction dump
(written with ``eval.cli dump --save-probs``) and reports success/RTE/RRE
per cell — the direct experiment that replaces the drop_insiders noise
proxy (scripts/probe_fn_weight.py): the classifier's actual error
structure, not a synthetic model of it.

Run on the chip:  python scripts/solve_grid.py --data-dir /tmp/street_dump_e9
One process holds the TPU; cells share compilations (threshold changes
are host-side relabels; each distinct outside_weight compiles once).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepi2p_tpu.eval.harness import evaluate_registration


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--img-h", type=int, default=96)
    p.add_argument("--img-w", type=int, default=160)
    p.add_argument("--n-inits", type=int, default=64)
    p.add_argument("--max-iter", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--thresholds", default="argmax,0.4,0.3,0.2")
    p.add_argument("--outside-weights", default="1.0,0.5,0.2")
    args = p.parse_args(argv)

    thresholds = [None if t == "argmax" else float(t)
                  for t in args.thresholds.split(",")]
    weights = [float(w) for w in args.outside_weights.split(",")]

    # weight-major order: all cells of one outside_weight reuse its compile
    for w in weights:
        for t in thresholds:
            t0 = time.time()
            summ = evaluate_registration(
                args.data_dir, method="frustum", H=args.img_h, W=args.img_w,
                n_inits=args.n_inits, max_iter=args.max_iter,
                batch_size=args.batch_size, outside_weight=w,
                inside_threshold=t)
            print(json.dumps({
                "threshold": "argmax" if t is None else t,
                "outside_weight": w,
                "success": summ["success_rate"],
                "rte_mean": round(summ["rte_mean"], 3),
                "rre_mean": round(summ["rre_mean"], 2),
                "rte_ok": round(summ["rte_mean_success"], 3),
                "rre_ok": round(summ["rre_mean_success"], 2),
                "n": summ["num_pairs"], "sec": round(time.time() - t0, 1)}),
                flush=True)


if __name__ == "__main__":
    main()
