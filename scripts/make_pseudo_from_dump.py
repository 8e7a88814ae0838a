"""Build ICP pseudo point clouds from a dump directory.

The reference's ICP branch consumes pseudo clouds from monodepth2 — an
external network (``evaluation/icp/save_depth_map.py``).  Without a depth
net in this image, the GT depth of the dumped insiders plays that role: a
perfect-depth oracle that exercises the same ICP machinery
(scale calibration, multi-init, 2D flattening).

    python scripts/make_pseudo_from_dump.py --data-dir DUMP --out PSEUDO
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-points", type=int, default=4096)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from deepi2p_tpu.eval.dump import load_dump, list_dump_prefixes

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    for prefix in list_dump_prefixes(args.data_dir):
        d = load_dump(args.data_dir, prefix)
        cam = d["pc"] @ d["P"][:3, :3].T + d["P"][:3, 3]
        inside = d["coarse_label"] > 0
        pts = cam[inside]
        if len(pts) > args.max_points:
            pts = pts[rng.choice(len(pts), args.max_points, replace=False)]
        np.save(os.path.join(args.out, f"{prefix}_pc.npy"),
                pts.T.astype(np.float32))
        print(prefix, pts.shape[0])


if __name__ == "__main__":
    main()
