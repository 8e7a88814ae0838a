"""6-DoF (3D-mode) solver quality table at bench scale.

The round-2 tables only swept the 2D (yaw+t) mode; the 3D angle-axis
path (mirroring ``evaluation/frustum_reg/src/registration_3d.hpp``) had
parity/recovery tests but no success-rate evidence.  This sweeps it at
bench scale on the chip: GT poses drawn with full yaw plus small
pitch/roll (frustum-only registration is weakly observable in pitch/roll
— the reference evaluates with is_2d=True for this reason,
``registration_lsq.py:264``), i.i.d. label-noise rows 0/10/15%.

Run on the TPU (no env vars):  python scripts/quality_table_3d.py
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from scipy.spatial.transform import Rotation
from deepi2p_tpu.ops.projection import project_points, coarse_labels
from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
N, B, NB = 20480, 8, 4


def make(rng, noise):
    yaw = rng.uniform(-np.pi, np.pi)
    pitch = rng.uniform(-0.08, 0.08)   # ~4.5 deg
    roll = rng.uniform(-0.08, 0.08)
    t = np.array([rng.uniform(-2, 2), rng.uniform(-0.05, 0.05),
                  rng.uniform(-2, 2)], np.float32)
    th = rng.uniform(0, 2 * np.pi, N)
    r = rng.uniform(5, 40, N)
    pc = np.stack([r * np.cos(th), rng.uniform(-2, 2, N),
                   r * np.sin(th)], -1).astype(np.float32)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = Rotation.from_euler("yxz", [yaw, pitch, roll]).as_matrix()
    P[:3, 3] = t
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    lab = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    lab = np.where(rng.uniform(size=N) < noise, 1 - lab, lab)
    return pc, lab.astype(np.float32), P


def solve(pc, lab, K, carry):
    r = jax.random.fold_in(jax.random.PRNGKey(0), carry.astype(jnp.int32))
    P, cost = solve_frustum_batch(pc, lab, K, H=H, W=W, rng=r, n_inits=64,
                                  max_iter=24, solver_stride=2, is_2d=False)
    return P, jnp.sum(cost)


exe = None
for noise in (0.0, 0.10, 0.15):
    rng = np.random.default_rng(7)
    ok, ok_2d_crit, rtes, rres = 0, 0, [], []
    carry = jnp.zeros((), jnp.float32)
    for nb in range(NB):
        made = [make(rng, noise) for _ in range(B)]
        pc = jnp.asarray(np.stack([m[0] for m in made]))
        lab = jnp.asarray(np.stack([m[1] for m in made]))
        K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
        if exe is None:
            exe = jax.jit(solve).lower(pc, lab, K, carry).compile()
        P_pred, carry = exe(pc, lab, K, carry)
        P_pred = np.asarray(P_pred, np.float64)
        for b in range(B):
            rte, rre = pose_diff_np(P_pred[b], np.asarray(made[b][2],
                                                          np.float64))
            ok += (rte < 2.0 and rre < 5.0)
            rtes.append(rte)
            rres.append(rre)
    print(f"3d noise={noise:.2f}: success {ok}/{B*NB} "
          f"rte={np.mean(rtes):.2f}m rre={np.mean(rres):.2f}deg "
          f"(rre median {np.median(rres):.2f})", flush=True)
