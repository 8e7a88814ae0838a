"""Solve-stage halving-policy sweep on the REAL chip: success rate under
10% label noise + per-batch time for (probe_stride, survivors) configs at
the bench solver settings (64 inits, max_iter=24, solver_stride=1).

Decides whether a deeper probe subsample / smaller survivor set keeps the
bench's quality-first claim while cutting the solve stage.

    timeout 3600 python scripts/perf_probe8.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.projection import project_points, coarse_labels
from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
N = 20480          # bench-scale cloud
B = 8              # bench batch shape
NBATCH = 4         # 32 problems per config
NOISE = 0.10


def make_problem(rng, n=N):
    yaw = rng.uniform(-np.pi, np.pi)
    t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)], np.float32)
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 40, n)
    pc = np.stack([r * np.cos(theta),
                   rng.uniform(-2, 2, n),
                   r * np.sin(theta)], axis=-1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    P[:3, 3] = t
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    labels = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    flip = rng.uniform(size=n) < NOISE
    labels = np.where(flip, 1 - labels, labels)
    return pc, labels.astype(np.float32), P


def main():
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(NBATCH):
        pcs, labs, Ps = [], [], []
        for _ in range(B):
            pc, lab, P = make_problem(rng)
            pcs.append(pc); labs.append(lab); Ps.append(P)
        batches.append((jnp.asarray(np.stack(pcs)),
                        jnp.asarray(np.stack(labs)),
                        jnp.asarray(np.tile(K_np, (B, 1, 1))),
                        np.stack(Ps)))

    configs = [
        ("ps=8 keep=8 stride=1 (cur)", dict(probe_stride=8, survivors=8,
                                            solver_stride=1)),
        ("ps=4 keep=8 stride=2", dict(probe_stride=4, survivors=8,
                                      solver_stride=2)),
        ("ps=2 keep=8 stride=4", dict(probe_stride=2, survivors=8,
                                      solver_stride=4)),
    ]

    for name, kw in configs:
        def solve(pc, lab, K, carry, kw=kw):
            r = jax.random.fold_in(jax.random.PRNGKey(0),
                                   carry.astype(jnp.int32))
            P, cost = solve_frustum_batch(pc, lab, K, H=H, W=W, rng=r,
                                          n_inits=64, max_iter=24, **kw)
            return P, cost, jnp.sum(cost)
        carry0 = jnp.zeros((), jnp.float32)
        a0 = batches[0]
        exe = jax.jit(solve).lower(a0[0], a0[1], a0[2], carry0).compile()
        _, _, c = exe(a0[0], a0[1], a0[2], carry0)
        np.asarray(c)  # warm sync
        ok, tot = 0, 0
        t0 = time.perf_counter()
        for pc, lab, K, Ps in batches:
            P_pred, cost, c = exe(pc, lab, K, c)
            P_pred = np.asarray(P_pred, np.float64)
            for b in range(B):
                rte, rre = pose_diff_np(P_pred[b], Ps[b].astype(np.float64))
                ok += (rte < 2.0 and rre < 5.0)
                tot += 1
        dt = (time.perf_counter() - t0) / NBATCH
        print(f"{name:28s}: success {ok}/{tot}  {dt * 1e3:7.2f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
