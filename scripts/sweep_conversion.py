"""Close the conversion gap on the committed e60 dump (VERDICT r4 #2).

The e60 street checkpoint dumps at coarse accuracy 0.951, yet the frustum
row converts to only 0.171 success — while the round-3 cleanup ladder
predicted 0.3–0.6 at that accuracy.  This script answers, without any
retraining, two questions on the COMMITTED dump
(``ckpts/street_r3/headline_dump``, written with ``--save-probs``):

1. What is the best achievable success from the e60 predictions?  Sweep
   the host-side decision threshold (``inside_threshold`` on the dumped
   ``p_inside``) × the frustum cost's ``outside_weight``
   (recall-vs-precision trade in the solver itself) — the two levers the
   reference never exposes (its operating point is fixed argmax,
   ``evaluation/registration_lsq.py:291-298``).
2. WHY does 0.951 accuracy convert so poorly?  Per-pair anatomy at the
   argmax point: which failures are RRE-limited vs RTE-limited, and how
   success correlates with per-pair accuracy / recall.

Outputs ``ckpts/street_r3/conversion_sweep.json`` with
  * ``operating_points``: host-only precision/recall/accuracy per threshold
  * ``sweep``: success over (threshold × outside_weight), seed-averaged
  * ``best``: the winning combo re-measured at 5 seeds
  * ``anatomy``: per-pair argmax failure classification

Run on the chip (fast) or CPU (slow):
    python scripts/sweep_conversion.py
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/sweep_conversion.py --seeds 1
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_operating_points(dump_dir, thresholds):
    """Pure-numpy: accuracy/precision/recall per decision threshold."""
    from deepi2p_tpu.eval.dump import load_dump, list_dump_prefixes

    prefixes = list_dump_prefixes(dump_dir)
    dumps = [load_dump(dump_dir, p) for p in prefixes]
    rows = []
    for t in thresholds:
        tp = fp = fn = tn = 0
        for d in dumps:
            pred = (d["coarse_pred"] if t is None
                    else (d["p_inside"] > t).astype(np.int32))
            lab = d["coarse_label"]
            tp += int(((pred == 1) & (lab == 1)).sum())
            fp += int(((pred == 1) & (lab == 0)).sum())
            fn += int(((pred == 0) & (lab == 1)).sum())
            tn += int(((pred == 0) & (lab == 0)).sum())
        n = tp + fp + fn + tn
        rows.append({
            "threshold": t,
            "accuracy": (tp + tn) / n,
            "precision": tp / max(tp + fp, 1),
            "recall": tp / max(tp + fn, 1),
        })
    return rows


def per_pair_anatomy(dump_dir, H, W, n_inits, max_iter, seed=0,
                     halving=None):
    """Argmax-point per-pair success vs per-pair error stats."""
    from deepi2p_tpu.eval.dump import load_dump, list_dump_prefixes
    from deepi2p_tpu.eval.harness import evaluate_registration
    from deepi2p_tpu.register.metrics import pose_diff_np

    save_dir = os.path.join(dump_dir, "_anatomy")
    summ = evaluate_registration(dump_dir, method="frustum", H=H, W=W,
                                 n_inits=n_inits, max_iter=max_iter,
                                 seed=seed, save_dir=save_dir,
                                 **(halving or {}))
    P_pred_all = np.load(os.path.join(save_dir, "P_pred_all_np.npy"))
    P_gt_all = np.load(os.path.join(save_dir, "P_gt_all_np.npy"))
    prefixes = list_dump_prefixes(dump_dir)
    pairs = []
    for i, p in enumerate(prefixes):
        d = load_dump(dump_dir, p)
        pred, lab = d["coarse_pred"], d["coarse_label"]
        acc = float((pred == lab).mean())
        rec = float(((pred == 1) & (lab == 1)).sum()
                    / max((lab == 1).sum(), 1))
        prec = float(((pred == 1) & (lab == 1)).sum()
                     / max((pred == 1).sum(), 1))
        rte, rre = pose_diff_np(P_pred_all[i], P_gt_all[i])
        pairs.append({"prefix": p, "accuracy": acc, "recall": rec,
                      "precision": prec,
                      "n_inside_label": int((lab == 1).sum()),
                      "n_inside_pred": int((pred == 1).sum()),
                      "rte": float(rte), "rre": float(rre),
                      "success": bool(rte < 2.0 and rre < 5.0)})
    fails = [e for e in pairs if not e["success"]]
    anatomy = {
        "summary": summ,
        "n_fail": len(fails),
        # a failure is RRE-limited if rotation alone already violates the
        # gate; RTE-limited if rotation is fine but translation misses;
        # both-limited otherwise
        "rre_limited": sum(1 for e in fails
                           if e["rre"] >= 5.0 and e["rte"] < 2.0),
        "rte_limited": sum(1 for e in fails
                           if e["rte"] >= 2.0 and e["rre"] < 5.0),
        "both_limited": sum(1 for e in fails
                            if e["rte"] >= 2.0 and e["rre"] >= 5.0),
        "acc_mean_success": float(np.mean(
            [e["accuracy"] for e in pairs if e["success"]])
            if any(e["success"] for e in pairs) else np.nan),
        "acc_mean_fail": float(np.mean([e["accuracy"] for e in fails])
                               if fails else np.nan),
        "pairs": pairs,
    }
    return anatomy


def margin_sweep(args, anchor, evaluate_registration, H, W, on_row=None):
    """Sweep the frustum cost's ``edge_margin_px`` at a fixed
    (threshold, outside_weight) operating point."""
    halving = getattr(args, "halving", None) or {}
    rows = []
    for m in args.edge_margins:
        succ = []
        for seed in range(args.seeds):
            summ = evaluate_registration(
                args.dump_dir, method="frustum", H=H, W=W,
                n_inits=args.n_inits, max_iter=args.max_iter, seed=seed,
                inside_threshold=anchor["threshold"],
                outside_weight=anchor["outside_weight"],
                edge_margin_px=m, **halving)
            succ.append(summ["success_rate"])
        row = {"edge_margin_px": m,
               "threshold": anchor["threshold"],
               "outside_weight": anchor["outside_weight"],
               "success_mean": float(np.mean(succ)), "per_seed": succ}
        rows.append(row)
        print("margin", json.dumps(row), flush=True)
        if on_row is not None:
            on_row(rows)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump-dir", default="ckpts/street_r3/headline_dump")
    ap.add_argument("--out-json", default="ckpts/street_r3/conversion_sweep.json")
    ap.add_argument("--img-h", type=int, default=96)
    ap.add_argument("--img-w", type=int, default=160)
    ap.add_argument("--n-inits", type=int, default=60)
    ap.add_argument("--max-iter", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--final-seeds", type=int, default=5)
    ap.add_argument("--skip-anatomy", action="store_true")
    ap.add_argument("--edge-margins", type=float, nargs="*", default=None,
                    help="if given, sweep the frustum cost's edge_margin_px "
                         "at the best (threshold, outside_weight) point — "
                         "border-band-error mitigation "
                         "(register.frustum edge_margin_px)")
    ap.add_argument("--only-margins", action="store_true",
                    help="with --edge-margins: skip the full "
                         "(threshold x weight) grid and anchor the margin "
                         "sweep at the operating point given by "
                         "--anchor-threshold/--anchor-outside-weight")
    ap.add_argument("--anchor-threshold", type=float, default=None)
    ap.add_argument("--anchor-outside-weight", type=float, default=1.0)
    ap.add_argument("--thresholds", type=float, nargs="*", default=None,
                    help="override the threshold grid (argmax None is "
                         "always prepended); e.g. --thresholds 0.4 0.45 "
                         "0.5 for a focused sweep at large N where the "
                         "generic solver path is expensive")
    ap.add_argument("--out-weights", type=float, nargs="*", default=None,
                    help="override the outside_weight grid (non-1.0 "
                         "values route through the slow generic LM path)")
    ap.add_argument("--probe-stride", type=int, default=0,
                    help="frustum halving probe point stride for all "
                         "frustum rows (0 = solver default); re-pinned "
                         "under structured noise, scripts/probe_halving.py")
    ap.add_argument("--survivors", type=int, default=0,
                    help="frustum halving survivor count (0 = default)")
    ap.add_argument("--skip-confidence", action="store_true")
    ap.add_argument("--host-only", action="store_true",
                    help="operating-point stats only (pure numpy, no "
                         "solver) — safe to run concurrently with a "
                         "live chip job")
    args = ap.parse_args(argv)
    args.halving = {}
    if args.probe_stride:
        args.halving["probe_stride"] = args.probe_stride
    if args.survivors:
        args.halving["survivors"] = args.survivors

    from deepi2p_tpu.eval.harness import evaluate_registration

    def _write(result, note=""):
        # incremental checkpointing: a timeout mid-sweep must not lose the
        # completed sections (each solver evaluation is minutes at large N)
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
        if note:
            print(f"wrote {args.out_json} ({note})", flush=True)

    thresholds = ([None] + list(args.thresholds)
                  if args.thresholds is not None
                  else [None, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5])
    out_weights = (list(args.out_weights)
                   if args.out_weights is not None else [1.0, 0.5, 0.3])
    H, W = args.img_h, args.img_w

    result = {"dump_dir": args.dump_dir,
              "budget": {"n_inits": args.n_inits, "max_iter": args.max_iter,
                         "seeds": args.seeds}}

    result["operating_points"] = host_operating_points(args.dump_dir,
                                                       thresholds)
    print(json.dumps(result["operating_points"], indent=1), flush=True)
    _write(result)

    if args.host_only:
        _write(result, "host-only")
        return

    if args.only_margins:
        assert args.edge_margins, "--only-margins needs --edge-margins"
        best = {"threshold": args.anchor_threshold,
                "outside_weight": args.anchor_outside_weight}
        def _on_row(rows):
            result["margin_sweep"] = rows
            _write(result)
        result["margin_sweep"] = margin_sweep(
            args, best, evaluate_registration, H, W, on_row=_on_row)
        _write(result, "margins only")
        return

    # PnP threshold sweep (no outside_weight — PnP has no robust cost to
    # weight; the threshold changes which points count as inside and thus
    # the 2D-3D correspondences RANSAC sees)
    pnp_rows = []
    for t in thresholds:
        summ = evaluate_registration(
            args.dump_dir, method="pnp", H=H, W=W, seed=0,
            n_inits=args.n_inits, max_iter=args.max_iter,
            inside_threshold=t)
        pnp_rows.append({"threshold": t,
                         "success": summ["success_rate"]})
        print("pnp", json.dumps(pnp_rows[-1]), flush=True)
        result["pnp_sweep"] = pnp_rows
        _write(result)

    sweep = []
    for t in thresholds:
        for w in out_weights:
            # (t=None, w=1.0) is the headline argmax point — kept in the
            # grid as the sanity anchor against headline.json
            succ = []
            for seed in range(args.seeds):
                summ = evaluate_registration(
                    args.dump_dir, method="frustum", H=H, W=W,
                    n_inits=args.n_inits, max_iter=args.max_iter,
                    seed=seed, inside_threshold=t, outside_weight=w,
                    **args.halving)
                succ.append(summ["success_rate"])
            row = {"threshold": t, "outside_weight": w,
                   "success_mean": float(np.mean(succ)),
                   "per_seed": succ}
            sweep.append(row)
            print(json.dumps(row), flush=True)
            result["sweep"] = sweep
            _write(result)

    best = max(sweep, key=lambda r: r["success_mean"])
    succ = []
    for seed in range(args.final_seeds):
        summ = evaluate_registration(
            args.dump_dir, method="frustum", H=H, W=W,
            n_inits=args.n_inits, max_iter=args.max_iter, seed=seed,
            inside_threshold=best["threshold"],
            outside_weight=best["outside_weight"], **args.halving)
        succ.append(summ["success_rate"])
    result["best"] = {**best,
                      "final_seeds": args.final_seeds,
                      "final_success_mean": float(np.mean(succ)),
                      "final_per_seed": succ}
    print("best:", json.dumps(result["best"]), flush=True)
    _write(result)

    # confidence-weighting mini-sweep at the winning operating point:
    # weight each robust block by |2p-1|^gamma (register.frustum
    # point_weights) so near-boundary labels pull the solve less
    gammas = [] if args.skip_confidence else [0.5, 1.0, 2.0]
    gsweep = []
    for g in gammas:
        succ = []
        for seed in range(args.seeds):
            summ = evaluate_registration(
                args.dump_dir, method="frustum", H=H, W=W,
                n_inits=args.n_inits, max_iter=args.max_iter, seed=seed,
                inside_threshold=best["threshold"],
                outside_weight=best["outside_weight"],
                confidence_gamma=g, **args.halving)
            succ.append(summ["success_rate"])
        row = {"gamma": g, "success_mean": float(np.mean(succ)),
               "per_seed": succ}
        gsweep.append(row)
        print(json.dumps(row), flush=True)
        result["confidence_sweep"] = gsweep
        _write(result)

    if args.edge_margins:
        def _on_row(rows):
            result["margin_sweep"] = rows
            _write(result)
        result["margin_sweep"] = margin_sweep(
            args, best, evaluate_registration, H, W, on_row=_on_row)

    if not args.skip_anatomy:
        result["anatomy"] = per_pair_anatomy(
            args.dump_dir, H, W, args.n_inits, args.max_iter,
            halving=args.halving)
        a = dict(result["anatomy"])
        a.pop("pairs")
        print("anatomy:", json.dumps(a), flush=True)

    _write(result, "complete")


if __name__ == "__main__":
    main()
