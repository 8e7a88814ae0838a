"""Solver quality under STRUCTURED (clustered) label noise at bench scale.

Round-2 quality tables used symmetric i.i.d. flips; real classifier
errors are clustered (whole occluded structures, frustum-border bands).
CPU probing at N=4096 showed the bench knob that loses success under
sector noise is solver_stride (2 -> 3/8, 1 -> 5-6/8 at 64 inits); this
script measures the same at bench scale (N=20480) on the chip so the
bench default is chosen on evidence.

Run on the TPU (no env vars):  python scripts/quality_table_structured.py
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from deepi2p_tpu.ops.projection import project_points, coarse_labels
from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np
from deepi2p_tpu.register.noise import (flip_iid, flip_sectors,
                                        flip_border_band, error_rate)

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
N, B, NB = 20480, 8, 4


def make(rng, mode):
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
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    lab = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    if mode == "iid10":
        cor = flip_iid(rng, lab, 0.10)
    elif mode == "sector":
        cor = flip_sectors(rng, pc, lab, n_sectors=32, n_flipped=3)
    elif mode == "border":
        cor = flip_border_band(rng, lab, pc, P, K_np, H, W,
                               band_px=40.0, rate=0.5)
    else:
        raise ValueError(mode)
    return pc, cor.astype(np.float32), P, error_rate(lab, cor)


for mode in ("iid10", "sector", "border"):
    for stride in (2, 1):
        def solve(pc, lab, K, carry, _stride=stride):
            r = jax.random.fold_in(jax.random.PRNGKey(0),
                                   carry.astype(jnp.int32))
            P, cost = solve_frustum_batch(pc, lab, K, H=H, W=W, rng=r,
                                          n_inits=64, max_iter=24,
                                          solver_stride=_stride)
            return P, jnp.sum(cost)

        exe = None
        rng = np.random.default_rng(7)
        ok, rtes, rres, rates = 0, [], [], []
        carry = jnp.zeros((), jnp.float32)
        for nb in range(NB):
            made = [make(rng, mode) for _ in range(B)]
            pc = jnp.asarray(np.stack([m[0] for m in made]))
            lab = jnp.asarray(np.stack([m[1] for m in made]))
            rates += [m[3] for m in made]
            K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
            if exe is None:
                exe = jax.jit(solve).lower(pc, lab, K, carry).compile()
            P_pred, carry = exe(pc, lab, K, carry)
            P_pred = np.asarray(P_pred, np.float64)
            for b in range(B):
                rte, rre = pose_diff_np(P_pred[b],
                                        np.asarray(made[b][2], np.float64))
                ok += (rte < 2.0 and rre < 5.0)
                rtes.append(rte)
                rres.append(rre)
        print(f"{mode:7s} stride={stride}: err={np.mean(rates):.3f} "
              f"success {ok}/{B*NB} rte={np.mean(rtes):.2f}m "
              f"rre={np.mean(rres):.2f}deg", flush=True)
