"""Registration error metrics.

RTE / RRE / success-rate exactly as defined by the reference — the repo's
only quantitative metrics (``evaluation/registration_pnp.py:84-92``,
``evaluation/registration_result_analysis.py:37-47``):

  * ``P_diff = inv(P_pred) @ P_gt``
  * RTE = ||translation(P_diff)||_2
  * RRE = sum |euler('xzy', degrees)| of rotation(P_diff)
    (scipy extrinsic x-z-y convention)
  * success := RTE < 2 m AND RRE < 5 deg.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _euler_xzy(R: jax.Array) -> jax.Array:
    """Extrinsic x-z-y euler angles of R (radians), scipy convention.

    For extrinsic 'xzy': ``R = Ry(g) @ Rz(b) @ Rx(a)`` =>
    ``R[1,0] = sin(b)``; ``a = atan2(-R[1,2], R[1,1])``;
    ``g = atan2(-R[2,0], R[0,0])``.
    """
    b = jnp.arcsin(jnp.clip(R[1, 0], -1.0, 1.0))
    a = jnp.arctan2(-R[1, 2], R[1, 1])
    g = jnp.arctan2(-R[2, 0], R[0, 0])
    return jnp.stack([a, b, g])


def pose_diff(P_pred: jax.Array, P_gt: jax.Array):
    """(RTE, RRE-degrees) for (...,4,4) pose pairs (jax, vmappable)."""
    def one(Pp, Pg):
        D = jnp.linalg.solve(Pp, Pg)
        rte = jnp.linalg.norm(D[:3, 3])
        rre = jnp.sum(jnp.abs(_euler_xzy(D[:3, :3]))) * 180.0 / jnp.pi
        return rte, rre
    flat_p = P_pred.reshape(-1, 4, 4)
    flat_g = P_gt.reshape(-1, 4, 4)
    rte, rre = jax.vmap(one)(flat_p, flat_g)
    return rte.reshape(P_pred.shape[:-2]), rre.reshape(P_pred.shape[:-2])


def pose_diff_np(P_pred: np.ndarray, P_gt: np.ndarray):
    """Host-side reference implementation via scipy (oracle for tests)."""
    from scipy.spatial.transform import Rotation
    D = np.linalg.inv(P_pred) @ P_gt
    rte = float(np.linalg.norm(D[:3, 3]))
    rre = float(np.sum(np.abs(
        Rotation.from_matrix(D[:3, :3]).as_euler("xzy", degrees=True))))
    return rte, rre


def registration_summary(rte: np.ndarray, rre: np.ndarray,
                         rte_thresh: float = 2.0,
                         rre_thresh: float = 5.0) -> Dict[str, float]:
    """Mean/std errors + success rate
    (``evaluation/registration_result_analysis.py:37-47``)."""
    rte = np.asarray(rte, np.float64)
    rre = np.asarray(rre, np.float64)
    ok = (rte < rte_thresh) & (rre < rre_thresh)
    return {
        "rte_mean": float(rte.mean()), "rte_std": float(rte.std()),
        "rre_mean": float(rre.mean()), "rre_std": float(rre.std()),
        "success_rate": float(ok.mean()),
        "rte_mean_success": float(rte[ok].mean()) if ok.any() else float("nan"),
        "rre_mean_success": float(rre[ok].mean()) if ok.any() else float("nan"),
        "num_pairs": int(rte.size),
    }
