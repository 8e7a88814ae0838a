"""PnP registration over the fine-resolution labels.

Replaces ``solve_PnP`` (``evaluation/registration_pnp.py:95-148``): points
predicted inside the frustum are paired with the centre of their predicted
1/32-resolution grid cell; pose is recovered by RANSAC PnP with a 0.6-cell
reprojection threshold, 500 hypotheses, and the same guards (>=4 points,
``|t| < sqrt(200)=14.14``, identity fallback, outlier-ratio cost).

TPU-native design: instead of OpenCV's sequential RANSAC, all hypotheses
are scored simultaneously — minimal 6-point subsets are drawn with a
Gumbel-top-k over the inside mask, each subset solved by DLT
(eigendecomposition of the 12x12 normal matrix + 3x3 SVD orthogonalisation,
all batched), inliers counted in one (hypo x point) reprojection pass, and
the best hypothesis polished by Gauss-Newton on its inliers.  A cv2 oracle
(``solve_pnp_cv2``) is kept for parity testing.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .frustum import rodrigues


class PnPResult(NamedTuple):
    P: jax.Array            # (4, 4)
    cost: jax.Array         # outlier ratio, 1.0 on failure
    n_inliers: jax.Array


def fine_label_to_cell(fine_label: jax.Array, W_fine: int,
                       center: bool = False):
    """label -> (x, y) cell coordinates (``registration_pnp.py:108-110``).

    ``center=True`` targets cell centres (+0.5): the projection of a point
    through the true pose lands uniformly inside its cell, so centre targets
    make the true pose an inlier at the 0.6-cell threshold ~90% of the time
    vs ~28% for the reference's top-left-corner convention — a pure accuracy
    improvement used by the TPU solver.
    """
    y = fine_label // W_fine
    x = fine_label - y * W_fine
    uv = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return uv + 0.5 if center else uv


def _smallest_eigvec(A: jax.Array, iters: int = 20) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of a PSD (12, 12) matrix via
    inverse power iteration (convergence ratio lambda1/lambda2, which is
    strong for DLT normal matrices where the solution direction is nearly
    null).

    ``jnp.linalg.eigh`` lowers to sequential QR sweeps that are very slow on
    TPU inside a vmapped RANSAC; inverse iteration is ~8 unrolled-Cholesky
    solves of a tiny SPD system.
    """
    from .frustum import _spd_solve
    n = A.shape[-1]
    shift = 1e-8 * jnp.trace(A) / n
    As = A + shift * jnp.eye(n)
    v = jnp.ones((n,)) / jnp.sqrt(n)

    def body(v, _):
        w = _spd_solve(As, v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-20), None
    v, _ = jax.lax.scan(body, v, None, length=iters, unroll=iters)
    return v


def _orthogonalize(M: jax.Array, iters: int = 12) -> jax.Array:
    """Nearest rotation (polar factor) of a 3x3 matrix by Newton iteration
    ``X <- (X + X^-T)/2`` — the SVD-free Kabsch/Procrustes projection.
    Sign is fixed to det>0 on entry."""
    det = jnp.linalg.det(M)
    M = M * jnp.where(det < 0, -1.0, 1.0)
    # normalise scale so the iteration contracts
    M = M / jnp.maximum(jnp.linalg.norm(M, ord="fro") / jnp.sqrt(3.0), 1e-20)

    def body(X, _):
        # X^-T via adjugate (3x3 closed form)
        c0 = jnp.cross(X[:, 1], X[:, 2])
        c1 = jnp.cross(X[:, 2], X[:, 0])
        c2 = jnp.cross(X[:, 0], X[:, 1])
        detX = jnp.dot(X[:, 0], c0)
        X_invT = jnp.stack([c0, c1, c2], axis=1) / jnp.where(
            jnp.abs(detX) > 1e-20, detX, 1e-20)
        return 0.5 * (X + X_invT), None
    X, _ = jax.lax.scan(body, M, None, length=iters, unroll=iters)
    return X


def _dlt_pose(X: jax.Array, uv: jax.Array, K_inv: jax.Array):
    """DLT pose from >=6 2D-3D pairs with known intrinsics.

    Args:
      X: (S, 3) object points; uv: (S, 2) pixels; K_inv: (3, 3).
    Returns:
      (R (3,3), t (3,)).
    """
    xn = (jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], axis=-1)
          @ K_inv.T)                      # (S, 3) normalized rays
    u, v = xn[:, 0], xn[:, 1]
    # Hartley normalisation of the 3D points (conditioning of A^T A)
    mu = jnp.mean(X, axis=0)
    scale = jnp.sqrt(3.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(X - mu, axis=1)), 1e-6)
    Xn = (X - mu) * scale
    Xh = jnp.concatenate([Xn, jnp.ones_like(X[:, :1])], axis=-1)  # (S, 4)
    Z = jnp.zeros_like(Xh)
    rows_u = jnp.concatenate([Xh, Z, -u[:, None] * Xh], axis=-1)   # (S, 12)
    rows_v = jnp.concatenate([Z, Xh, -v[:, None] * Xh], axis=-1)   # (S, 12)
    A = jnp.concatenate([rows_u, rows_v], axis=0)                  # (2S, 12)
    # smallest eigenvector of A^T A (TPU-friendly flipped power iteration)
    m = _smallest_eigvec(A.T @ A).reshape(3, 4)
    # undo 3D normalisation: M' [sX; 1] == M [X; 1]
    m = jnp.concatenate(
        [m[:, :3] * scale, (m[:, 3] - m[:, :3] @ (mu * scale))[:, None]],
        axis=1)
    # enforce cheirality: points should have positive depth
    Xh_full = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=-1)
    depth = Xh_full @ m[2]
    m = m * jnp.where(jnp.sum(depth) < 0, -1.0, 1.0)
    M = m[:, :3]
    # scale = cbrt(det) of the rotation-scaled block; project to SO(3)
    scale = jnp.cbrt(jnp.maximum(jnp.abs(jnp.linalg.det(M)), 1e-20))
    R = _orthogonalize(M)
    t = m[:, 3] / scale
    return R, t


def _reproj_err(R, t, X, uv, K):
    cam = X @ R.T + t
    z = jnp.maximum(cam[:, 2], 1e-6)
    px = K[0, 0] * cam[:, 0] / z + K[0, 2]
    py = K[1, 1] * cam[:, 1] / z + K[1, 2]
    err = jnp.sqrt((px - uv[:, 0]) ** 2 + (py - uv[:, 1]) ** 2)
    return jnp.where(cam[:, 2] > 0, err, 1e6)


def _gn_refine(R0, t0, X, uv, K, weights, iters: int = 10):
    """Gauss-Newton polish on weighted reprojection residuals."""
    aa0 = _rotmat_to_aa(R0)
    theta0 = jnp.concatenate([aa0, t0])

    def residuals(theta):
        R = rodrigues(theta[:3])
        cam = X @ R.T + theta[3:]
        z = jnp.maximum(cam[:, 2], 1e-6)
        px = K[0, 0] * cam[:, 0] / z + K[0, 2]
        py = K[1, 1] * cam[:, 1] / z + K[1, 2]
        r = jnp.stack([px - uv[:, 0], py - uv[:, 1]], axis=-1)
        return r * weights[:, None]

    def step(theta, _):
        from .frustum import _spd_solve
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)        # (S, 2, 6)
        H = jnp.einsum("nrp,nrq->pq", J, J) + 1e-6 * jnp.eye(6)
        g = jnp.einsum("nrp,nr->p", J, r)
        # H is SPD (J^T J + eps I): the unrolled Cholesky avoids
        # jnp.linalg.solve's pivoted LU, which serialises inside a
        # vmapped TPU scan (same reasoning as the frustum LM core)
        return theta - _spd_solve(H, g), None

    theta, _ = jax.lax.scan(step, theta0, None, length=iters,
                            unroll=iters)
    return rodrigues(theta[:3]), theta[3:]


def _rotmat_to_aa(R):
    """Rotation matrix -> angle-axis (numerically safe for small angles)."""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    axis = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]])
    sin = jnp.sin(theta)
    axis = axis / jnp.where(jnp.abs(sin) > 1e-6, 2.0 * sin, 1.0)
    return jnp.where(jnp.abs(sin) > 1e-6, axis * theta, axis * 0.5)


@functools.partial(jax.jit,
                   static_argnames=("W_fine", "n_hypotheses", "min_set",
                                    "lo_candidates"))
def solve_pnp(pc: jax.Array, coarse_pred: jax.Array, fine_pred: jax.Array,
              K: jax.Array, rng: jax.Array, *, W_fine: int,
              n_hypotheses: int = 500, reproj_thresh: float = 0.6,
              min_set: int = 8, lo_candidates: int = 4) -> PnPResult:
    """RANSAC PnP for one pair (vmap over a batch as needed).

    All matmuls at HIGHEST precision (cv2 solves in f64; TPU's default
    bf16 passes would corrupt the DLT normal matrix and GN refinement).

    Args:
      pc (N,3), coarse_pred (N,) {0,1}, fine_pred (N,) cell labels,
      K (3,3) at *full* resolution; scaled to cell resolution internally
      (``registration_pnp.py:102-104``).
    """
    with jax.default_matmul_precision("highest"):
        return _solve_pnp_impl(pc, coarse_pred, fine_pred, K, rng,
                               W_fine=W_fine, n_hypotheses=n_hypotheses,
                               reproj_thresh=reproj_thresh,
                               min_set=min_set, lo_candidates=lo_candidates)


def _solve_pnp_impl(pc, coarse_pred, fine_pred, K, rng, *, W_fine,
                    n_hypotheses, reproj_thresh, min_set, lo_candidates):
    mask = coarse_pred.astype(jnp.float32)
    n_inside = jnp.sum(mask)
    K_fine = (K / 32.0).at[2, 2].set(1.0)
    K_inv = jnp.linalg.inv(K_fine)
    uv = fine_label_to_cell(fine_pred, W_fine, center=True)  # (N, 2)

    # -- hypothesis sampling: gumbel-top-k over inside points ------------
    # approx_max_k: TPU-optimised partial reduction instead of a full
    # 500 x N sort; positions are distinct and the draw stays a uniform
    # random inside-subset.  Two-stage draw (approximate 4x-oversampled
    # candidate pull + tiny exact top_k within the candidates) keeps the
    # true top-min_set recall ~1 even when the inside set is sparse, so a
    # small inside count cannot silently substitute mask=0 points
    # (score ~ -46+gumbel) into the hypothesis sets.
    g = jax.random.gumbel(rng, (n_hypotheses, pc.shape[0]))
    scores = jnp.log(jnp.maximum(mask, 1e-20))[None, :] + g
    cand = min(4 * min_set, pc.shape[0])
    c_score, c_idx = jax.lax.approx_max_k(scores, cand)
    _, sel = jax.lax.top_k(c_score, min_set)
    subset_idx = jnp.take_along_axis(c_idx, sel, axis=1)  # (Hyp, min_set)

    def hypo(idx):
        R, t = _dlt_pose(pc[idx], uv[idx], K_inv)
        err = _reproj_err(R, t, pc, uv, K_fine)
        inl = (err < reproj_thresh).astype(jnp.float32) * mask
        return R, t, jnp.sum(inl)

    Rs, ts, n_inl = jax.vmap(hypo)(subset_idx)
    # -- LO-RANSAC: polish the top candidates with shrinking-threshold
    # inlier refits, then keep the best refined pose ----------------------
    _, top = jax.lax.top_k(n_inl, lo_candidates)

    def polish(R_f, t_f):
        for thresh in (1.5 * reproj_thresh, 1.25 * reproj_thresh,
                       reproj_thresh):
            err = _reproj_err(R_f, t_f, pc, uv, K_fine)
            w = (err < thresh).astype(jnp.float32) * mask
            R_n, t_n = _gn_refine(R_f, t_f, pc, uv, K_fine, w)
            err_n = _reproj_err(R_n, t_n, pc, uv, K_fine)
            better = (jnp.sum((err_n < reproj_thresh).astype(jnp.float32)
                              * mask)
                      >= jnp.sum((err < reproj_thresh).astype(jnp.float32)
                                 * mask))
            R_f = jnp.where(better, R_n, R_f)
            t_f = jnp.where(better, t_n, t_f)
        err_f = _reproj_err(R_f, t_f, pc, uv, K_fine)
        inl = jnp.sum((err_f < reproj_thresh).astype(jnp.float32) * mask)
        return R_f, t_f, inl

    R_c, t_c, inl_c = jax.vmap(polish)(Rs[top], ts[top])
    ci = jnp.argmax(inl_c)
    R_f, t_f, inl_f = R_c[ci], t_c[ci], inl_c[ci]
    # raw best hypothesis as fallback if polish hurt
    best = jnp.argmax(n_inl)
    use_raw = n_inl[best] > inl_f
    R_f = jnp.where(use_raw, Rs[best], R_f)
    t_f = jnp.where(use_raw, ts[best], t_f)
    inl_f = jnp.maximum(inl_f, n_inl[best])

    # -- guards (registration_pnp.py:123-146) -----------------------------
    ok = (n_inside >= 4) & (jnp.linalg.norm(t_f) < 14.14) & (inl_f >= 4)
    P = jnp.eye(4).at[:3, :3].set(R_f).at[:3, 3].set(t_f)
    P = jnp.where(ok, P, jnp.eye(4))
    cost = jnp.where(ok, 1.0 - inl_f / jnp.maximum(n_inside, 1.0), 1.0)
    return PnPResult(P=P, cost=cost, n_inliers=inl_f)


def solve_pnp_batch(pc, coarse_pred, fine_pred, K, rng, *, W_fine: int,
                    n_hypotheses: int = 500, reproj_thresh: float = 0.6):
    """Batched RANSAC PnP: (B,N,3) x (B,N) x (B,N) x (B,3,3) -> PnPResult(B)."""
    keys = jax.random.split(rng, pc.shape[0])
    fn = functools.partial(solve_pnp, W_fine=W_fine,
                           n_hypotheses=n_hypotheses,
                           reproj_thresh=reproj_thresh)
    return jax.vmap(fn)(pc, coarse_pred, fine_pred, K, keys)


def solve_pnp_cv2(pc_np: np.ndarray, coarse_pred: np.ndarray,
                  fine_pred: np.ndarray, K_np: np.ndarray, W_fine: int,
                  iterations: int = 500) -> Tuple[np.ndarray, float]:
    """OpenCV EPnP+RANSAC oracle, the reference's exact solver path
    (``registration_pnp.py:123-146``)."""
    import cv2
    mask = coarse_pred == 1
    pts = pc_np[mask].astype(np.float64)
    lab = fine_pred[mask]
    y = np.floor(lab / W_fine)
    x = lab - y * W_fine
    pix = np.stack([x, y], axis=-1).astype(np.float64)
    K_fine = (K_np / 32.0).copy()
    K_fine[2, 2] = 1.0
    if pts.shape[0] < 4:
        return np.eye(4), 1.0
    try:
        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            pts, pix, K_fine, None, useExtrinsicGuess=False,
            iterationsCount=iterations, reprojectionError=0.6,
            flags=cv2.SOLVEPNP_EPNP)
    except cv2.error:
        return np.eye(4), 1.0
    P = np.eye(4)
    if ok and np.linalg.norm(tvec) < 14.14 and inliers is not None:
        R, _ = cv2.Rodrigues(rvec)
        P[:3, :3] = R
        P[:3, 3] = tvec[:, 0]
        return P, 1.0 - len(inliers) / len(pts)
    return P, 1.0
