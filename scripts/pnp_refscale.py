"""PnP at the REFERENCE's fine-grid geometry (160x512 -> 5x16 cells).

VERDICT r3 #3: every round-3 e2e run used the 96x160 config whose fine
grid is 3x5 = 15 cells — too few 2D-3D correspondences for PnP geometry,
which is why the PnP row was 0.00.  The reference trains KITTI at
160x512 -> L = 5x16 = 80 cells (``multimodal_classifier.py:104-112``)
and its PnP consumes exactly that grid
(``evaluation/registration_pnp.py:95-148``).

This script isolates the GEOMETRY question from classifier quality:
KITTI-shaped scenes (N=20480, street-like cylindrical structure), GT
coarse/fine labels from the projection math, corrupted with the
classifier-like noise models (i.i.d. flips + the border band that
matches real error structure from round 3), then solved with the batched
RANSAC-DLT PnP (``register/pnp.py``).  Success = RTE<2m ∧ RRE<5°
(``registration_result_analysis.py:37-38``).

Writes ``ckpts/pnp_refscale.json`` (committed) so the claim "PnP works
at the reference grid; the 3x5 grid was the blocker" is a regenerable
artifact:  python scripts/pnp_refscale.py        (chip or CPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.projection import project_points, coarse_labels, fine_labels
from deepi2p_tpu.register.pnp import solve_pnp_batch
from deepi2p_tpu.register.metrics import pose_diff_np
from deepi2p_tpu.register.noise import flip_iid, flip_border_band, error_rate

H, W, SCALE = 160, 512, 32
W_FINE, H_FINE = W // SCALE, H // SCALE          # 16 x 5 = 80 cells
N, PAIRS, B = 20480, 48, 8
K_np = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]],
                np.float32)


def make_pair(rng):
    """Street-like cloud + a pose in the solver's recovery envelope."""
    yaw = rng.uniform(-np.pi, np.pi)
    t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)], np.float32)
    th = rng.uniform(0, 2 * np.pi, N)
    r = rng.uniform(5, 40, N)
    pc = np.stack([r * np.cos(th), rng.uniform(-2, 2, N),
                   r * np.sin(th)], -1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    P[:3, 3] = t
    return pc, P


def jitter_fine(rng, fine, coarse, rate):
    """Classifier-like fine errors: with ``rate``, an insider's fine cell
    moves to a uniformly-random 8-neighbour (clamped to the grid) — real
    fine mistakes are adjacent-cell, not uniform over L."""
    fine = fine.copy()
    y, x = fine // W_FINE, fine % W_FINE
    hit = (rng.random(fine.shape) < rate) & (coarse > 0)
    dx = rng.integers(-1, 2, fine.shape)
    dy = rng.integers(-1, 2, fine.shape)
    xn = np.clip(x + dx, 0, W_FINE - 1)
    yn = np.clip(y + dy, 0, H_FINE - 1)
    return np.where(hit, yn * W_FINE + xn, fine).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    pcs, Ps = zip(*[make_pair(rng) for _ in range(PAIRS)])
    pcs, Ps = np.stack(pcs), np.stack(Ps)
    pxpy, z = project_points(jnp.asarray(pcs), jnp.asarray(Ps[:, :3]),
                             jnp.asarray(np.tile(K_np, (PAIRS, 1, 1))))
    coarse_gt = np.asarray(coarse_labels(pxpy, z, H, W))
    fine_gt = np.asarray(jnp.clip(fine_labels(pxpy, SCALE, W_FINE),
                                  0, W_FINE * H_FINE - 1))

    configs = [("clean", 0.0, 0.0), ("iid05", 0.05, 0.25),
               ("iid10", 0.10, 0.25), ("border", -1.0, 0.25)]
    out = {"geometry": {"H": H, "W": W, "fine_grid": [H_FINE, W_FINE],
                        "N": N, "pairs": PAIRS},
           "rows": {}}
    for name, cr, fr in configs:
        rng_n = np.random.default_rng(hash(name) % 2**31)
        coarse = np.zeros_like(coarse_gt)
        for i in range(PAIRS):
            if cr < 0:   # round-3's realistic border-band error structure
                coarse[i] = flip_border_band(rng_n, coarse_gt[i], pcs[i],
                                             Ps[i], K_np, H, W,
                                             band_px=40.0, rate=0.5)
            else:
                coarse[i] = flip_iid(rng_n, coarse_gt[i], cr)
        fine = np.stack([jitter_fine(rng_n, fine_gt[i], coarse_gt[i], fr)
                         for i in range(PAIRS)])
        err = float(np.mean([error_rate(coarse_gt[i], coarse[i])
                             for i in range(PAIRS)]))

        rte = np.zeros(PAIRS)
        rre = np.zeros(PAIRS)
        t0 = time.perf_counter()
        for s0 in range(0, PAIRS, B):
            sl = slice(s0, s0 + B)
            res = solve_pnp_batch(jnp.asarray(pcs[sl]),
                                  jnp.asarray(coarse[sl]),
                                  jnp.asarray(fine[sl]),
                                  jnp.asarray(np.tile(K_np, (B, 1, 1))),
                                  jax.random.fold_in(jax.random.PRNGKey(0),
                                                     s0),
                                  W_fine=W_FINE)
            P_pred = np.asarray(res.P)
            for i in range(P_pred.shape[0]):
                rte[s0 + i], rre[s0 + i] = pose_diff_np(P_pred[i],
                                                        Ps[s0 + i])
        dt = time.perf_counter() - t0
        succ = float(np.mean((rte < 2.0) & (rre < 5.0)))
        row = {"coarse_err": round(err, 4), "fine_jitter": fr,
               "success": round(succ, 4),
               "rte_mean": round(float(rte.mean()), 3),
               "rre_mean": round(float(rre.mean()), 3),
               "solve_s": round(dt, 2)}
        out["rows"][name] = row
        print(name, json.dumps(row), flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ckpts", "pnp_refscale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
