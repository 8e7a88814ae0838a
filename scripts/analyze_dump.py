"""Per-sample dump diagnostics: what the frustum solver actually consumes.

Round-3 lesson (BENCH_NOTES.md): aggregate coarse accuracy is the wrong
gauge — 0.83 accuracy coexisted with 0.41 inside-class recall and 7/24
samples predicting a completely wrong wedge.  This script reports, per
dumped sample and in aggregate:

  - inside-class precision / recall / F1 (the solver's real input quality)
  - inside IoU (pred set vs GT set)
  - wedge yaw error: angle between the mean horizontal direction of the
    predicted insiders and of the GT insiders (a whole-wedge confusion
    shows up as ~90-180 deg here while accuracy still looks fine)

Usage:  python scripts/analyze_dump.py --data-dir /tmp/street_dump3
numpy-only (no jax import): safe to run while the TPU relay is held by a
training process.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def list_dump_prefixes(data_dir):
    return sorted({f[:9] for f in os.listdir(data_dir)
                   if f.endswith("_pc_label.npy")})


def load_dump(data_dir, prefix):
    d = np.load(os.path.join(data_dir, prefix + "_pc_label.npy"))
    out = dict(pc=d[0:3].T, coarse_pred=d[3].astype(np.int32),
               coarse_label=d[4].astype(np.int32))
    p_path = os.path.join(data_dir, prefix + "_p.npy")
    if os.path.isfile(p_path):
        out["p_inside"] = np.load(p_path)
    return out


def sample_stats(d):
    pred = d["coarse_pred"] == 1
    gt = d["coarse_label"] == 1
    tp = float((pred & gt).sum())
    prec = tp / max(pred.sum(), 1)
    rec = tp / max(gt.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    iou = tp / max((pred | gt).sum(), 1)

    def mean_dir(mask):
        if mask.sum() == 0:
            return None
        v = d["pc"][mask].mean(axis=0)
        v = np.array([v[0], v[2]])  # horizontal plane (x, z)
        n = np.linalg.norm(v)
        return v / n if n > 1e-9 else None

    dp, dg = mean_dir(pred), mean_dir(gt)
    yaw = (float(np.degrees(np.arccos(np.clip(np.dot(dp, dg), -1, 1))))
           if dp is not None and dg is not None else float("nan"))
    return dict(precision=prec, recall=rec, f1=f1, iou=iou,
                wedge_yaw_deg=yaw, n_pred=int(pred.sum()),
                n_gt=int(gt.sum()))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--json", action="store_true",
                   help="one JSON line per sample + aggregate")
    args = p.parse_args(argv)

    rows = []
    for prefix in list_dump_prefixes(args.data_dir):
        d = load_dump(args.data_dir, prefix)
        s = sample_stats(d)
        s["prefix"] = prefix
        rows.append(s)
        if args.json:
            print(json.dumps(s))
        else:
            print(f"{prefix}: prec={s['precision']:.2f} "
                  f"rec={s['recall']:.2f} f1={s['f1']:.2f} "
                  f"iou={s['iou']:.2f} wedge_yaw={s['wedge_yaw_deg']:.1f}deg "
                  f"n_pred={s['n_pred']} n_gt={s['n_gt']}")

    if rows:
        agg = {k: float(np.nanmean([r[k] for r in rows]))
               for k in ("precision", "recall", "f1", "iou",
                         "wedge_yaw_deg")}
        agg["n_samples"] = len(rows)
        agg["wrong_wedge_frac"] = float(np.mean(
            [not (r["wedge_yaw_deg"] < 45.0) for r in rows]))
        print(json.dumps({"aggregate": agg}))

    # threshold sweep (needs dumps written with --save-probs)
    probs = []
    for prefix in list_dump_prefixes(args.data_dir):
        d = load_dump(args.data_dir, prefix)
        if "p_inside" in d:
            probs.append((d["p_inside"], d["coarse_label"] == 1))
    if probs:
        for t in (0.5, 0.3, 0.2, 0.1, 0.05):
            prec, rec = [], []
            for p, gt in probs:
                pr = p > t
                tp = float((pr & gt).sum())
                prec.append(tp / max(pr.sum(), 1))
                rec.append(tp / max(gt.sum(), 1))
            print(json.dumps({"threshold": t,
                              "precision": float(np.mean(prec)),
                              "recall": float(np.mean(rec))}))


if __name__ == "__main__":
    main()
