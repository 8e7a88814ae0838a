"""Measure the ERROR STRUCTURE of a real prediction dump -> gate fixture.

VERDICT r3 weak #5 / next-round #6: the bench solver-config quality gate
(``tests/test_frustum.py::test_bench_config_quality_gate``) was pinned at
10% i.i.d. synthetic label noise; real classifier errors are spatially
structured (border bands, whole occluded wedges — BENCH_NOTES round 3).
This script measures, from an actual dump directory:

  * overall coarse error rate,
  * error rate INSIDE vs OUTSIDE a ``band_px`` frustum-boundary band
    (GT-projection signed distance, same geometry as
    ``register.noise.flip_border_band``),
  * spatial coherence: fraction of erroneous points whose 8 nearest
    neighbours are majority-erroneous (iid noise -> ~0; wedge/surface
    errors -> high),
  * inside precision / recall,

and writes ``tests/fixtures/error_structure.json``.  The re-pinned gate
test replays the border-band noise model AT THESE MEASURED PARAMETERS
on bench-scale problems, so the bench knobs (stride / iters / probe
ranking) are gated against the error geometry the classifier actually
produces, not a friendlier synthetic one.

    python scripts/characterize_errors.py --dump-dir ckpts/street_r3/headline_dump
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepi2p_tpu.eval.dump import load_dump, list_dump_prefixes


def signed_border_dist(pc, P, K, H, W):
    R, t = P[:3, :3], P[:3, 3]
    cam = pc @ R.T + t
    z = cam[:, 2]
    front = z > 0.1
    zs = np.where(front, z, 1.0)
    px = K[0, 0] * cam[:, 0] / zs + K[0, 2]
    py = K[1, 1] * cam[:, 1] / zs + K[1, 2]
    dx = np.maximum(-px, px - (W - 1))
    dy = np.maximum(-py, py - (H - 1))
    d = np.where((dx <= 0) & (dy <= 0), np.maximum(dx, dy),
                 np.hypot(np.maximum(dx, 0), np.maximum(dy, 0)))
    return d, front


def knn_coherence(pc, err, k=8):
    """Fraction of erroneous points whose k nearest neighbours are
    majority-erroneous (chunked O(N*M) host math, N~4096)."""
    idx = np.nonzero(err)[0]
    if len(idx) < 2:
        return 0.0
    hits = 0
    for i in idx:
        d2 = np.sum((pc - pc[i]) ** 2, axis=1)
        d2[i] = np.inf
        nn = np.argpartition(d2, k)[:k]
        hits += int(np.mean(err[nn]) > 0.5)
    return hits / len(idx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump-dir", required=True)
    ap.add_argument("--img-h", type=int, default=96)
    ap.add_argument("--img-w", type=int, default=160)
    ap.add_argument("--band-px", type=float, default=40.0)
    ap.add_argument("--out", default=None,
                    help="default: tests/fixtures/error_structure.json")
    args = ap.parse_args()

    H, W = args.img_h, args.img_w
    tot = band_n = band_err = off_n = off_err = 0
    tp = fp = fn = 0
    coh = []
    prefixes = list_dump_prefixes(args.dump_dir)
    for p in prefixes:
        d = load_dump(args.dump_dir, p)
        err = (d["coarse_pred"] != d["coarse_label"]).astype(np.int32)
        dist, front = signed_border_dist(d["pc"], d["P"], d["K"], H, W)
        band = front & (np.abs(dist) < args.band_px)
        band_n += int(band.sum()); band_err += int(err[band].sum())
        off = ~band
        off_n += int(off.sum()); off_err += int(err[off].sum())
        tot += err.size
        tp += int(((d["coarse_pred"] == 1) & (d["coarse_label"] == 1)).sum())
        fp += int(((d["coarse_pred"] == 1) & (d["coarse_label"] == 0)).sum())
        fn += int(((d["coarse_pred"] == 0) & (d["coarse_label"] == 1)).sum())
        coh.append(knn_coherence(d["pc"], err))

    fixture = {
        "dump_dir": os.path.relpath(args.dump_dir, "/root/repo"),
        "pairs": len(prefixes),
        "img": [H, W],
        "band_px": args.band_px,
        "error_rate": round((band_err + off_err) / max(tot, 1), 4),
        "band_error_rate": round(band_err / max(band_n, 1), 4),
        "offband_error_rate": round(off_err / max(off_n, 1), 4),
        "band_fraction": round(band_n / max(tot, 1), 4),
        "knn8_coherence": round(float(np.mean(coh)), 4),
        "inside_precision": round(tp / max(tp + fp, 1), 4),
        "inside_recall": round(tp / max(tp + fn, 1), 4),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "error_structure.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixture, f, indent=2)
    print(json.dumps(fixture, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
