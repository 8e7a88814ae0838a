"""Point-to-point ICP against a (monodepth) pseudo point cloud.

Replaces the Open3D ICP harness (``evaluation/icp/registration_icp.py``):

  * pseudo point cloud from a depth map: ``K^-1 @ [u,v,1] * depth``
    (``evaluation/icp/save_depth_map.py:60-102`` — the monodepth2 network
    itself is an external dependency there too; any depth source works);
  * depth-scale calibration against the mean depth of GT-visible points
    (``registration_icp.py:216-219``);
  * 60 random (tx, tz, ry) initialisations, best fitness wins, with the
    2D flattening of the result (``registration_icp.py:115-139``);
  * fitness = inlier fraction at threshold 1.0 m, like Open3D's
    ``registration_icp`` (``registration_icp.py:148-162``).

TPU-native: all inits run as one ``vmap``; each ICP iteration computes
nearest neighbours with the MXU pairwise-distance matmul (chunked over the
source axis), and the closed-form point-to-point update is a weighted
Kabsch (3x3 SVD).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.knn import pairwise_dist2


def depth_to_pointcloud(depth: jax.Array, K: jax.Array,
                        stride: int = 4) -> jax.Array:
    """Depth map (H, W) + intrinsics -> (M, 3) camera-frame points."""
    H, W = depth.shape
    d = depth[::stride, ::stride]
    ys, xs = jnp.meshgrid(jnp.arange(0, H, stride, dtype=jnp.float32),
                          jnp.arange(0, W, stride, dtype=jnp.float32),
                          indexing="ij")
    x = (xs - K[0, 2]) / K[0, 0] * d
    y = (ys - K[1, 2]) / K[1, 1] * d
    return jnp.stack([x, y, d], axis=-1).reshape(-1, 3)


def calibrate_depth_scale(pc_cam_z, inside_mask, pseudo_z):
    """Scale factor aligning pseudo-cloud depth to the GT-visible mean
    (``registration_icp.py:216-219``)."""
    m = inside_mask.astype(jnp.float32)
    mean_gt = jnp.sum(pc_cam_z * m) / jnp.maximum(jnp.sum(m), 1.0)
    return mean_gt / jnp.maximum(jnp.mean(pseudo_z), 1e-6)


class ICPResult(NamedTuple):
    P: jax.Array
    fitness: jax.Array


def _kabsch(src, dst, w):
    """Weighted point-to-point alignment: R, t minimising |R src + t - dst|."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_d = jnp.sum(dst * w[:, None], 0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, _, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


def _thr_schedule(threshold: float, coarse_threshold, max_iter: int):
    """Per-iteration correspondence thresholds.

    ``coarse_threshold=None`` reproduces the reference's single fixed
    threshold (Open3D default, ``registration_icp.py:148-162``).  A value
    > ``threshold`` runs a multi-scale anneal (geometric decay, the
    Open3D multi-scale recipe collapsed into one kernel): early iterations
    accept far correspondences — widening the convergence basin that made
    ICP the reference's weakest baseline — and the last iterations refine
    at the fine threshold that also scores fitness."""
    if coarse_threshold is None:
        return jnp.full((max_iter,), threshold, jnp.float32)
    return jnp.geomspace(coarse_threshold, threshold,
                         max_iter).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def icp_point_to_point(source, target, P_init, *, threshold: float = 1.0,
                       max_iter: int = 30,
                       coarse_threshold=None) -> ICPResult:
    """Fixed-iteration point-to-point ICP aligning source onto target.

    All matmuls at HIGHEST precision: the D=3 pose/Kabsch contractions are
    free, and TPU's default bf16 passes would perturb nearest-neighbour
    assignments and the Kabsch covariance (Open3D computes exact f64).

    Args:
      source (N,3): the network point cloud; target (M,3): pseudo cloud.
      coarse_threshold: optional starting threshold of a multi-scale
        anneal down to ``threshold`` (see :func:`_thr_schedule`).
    """
    with jax.default_matmul_precision("highest"):
        return _icp_point_to_point_impl(
            source, target, P_init, threshold=threshold, max_iter=max_iter,
            coarse_threshold=coarse_threshold)


def _nn1(moved, target):
    """(min_d2 (N,), argmin (N,)) nearest-target per point.

    On TPU the streaming Pallas kernel never materialises the (N, M)
    distance matrix the XLA path writes to HBM — at ICP scale
    (N=20480, M~5k) that matrix is ~400 MB *per init per iteration* and
    was the entire ICP cost (measured 16.9 s -> see BENCH_NOTES).
    """
    from ..ops.knn_pallas import nn1_pallas, pallas_eligible_nn1
    if pallas_eligible_nn1(moved, target):
        d2m, nn = nn1_pallas(moved[None], target[None])
        return d2m[0], nn[0]
    d2 = pairwise_dist2(moved[None], target[None])[0]      # (N, M)
    nn = jnp.argmin(d2, axis=1)
    return jnp.take_along_axis(d2, nn[:, None], 1)[:, 0], nn


def _icp_point_to_point_impl(source, target, P_init, *, threshold, max_iter,
                             coarse_threshold=None):
    R0, t0 = P_init[:3, :3], P_init[:3, 3]
    thr_sched = _thr_schedule(threshold, coarse_threshold, max_iter)

    def body(state, thr):
        R, t = state
        moved = source @ R.T + t
        d2m, nn = _nn1(moved, target)
        nn_d = jnp.sqrt(d2m)
        w = (nn_d < thr).astype(jnp.float32)
        Rn, tn = _kabsch(source, target[nn], w)
        ok = jnp.sum(w) >= 3
        R = jnp.where(ok, Rn, R)
        t = jnp.where(ok, tn, t)
        return (R, t), None

    (R, t), _ = jax.lax.scan(body, (R0, t0), thr_sched,
                             unroll=min(4, max_iter))
    moved = source @ R.T + t
    d2m, _ = _nn1(moved, target)
    fitness = jnp.mean((d2m < threshold ** 2).astype(jnp.float32))
    P = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return ICPResult(P=P, fitness=fitness)


def flatten_2d(P: jax.Array) -> jax.Array:
    """Force the y-axis unknowns out of the solution
    (``registration_icp.py:127-133``).

    The reference zeroes the y row/column and moves on; when the ICP
    solution had genuine y-coupling the zeroed block is no longer a
    rotation, and the reference silently relied on (old) scipy's
    ``Rotation.from_matrix`` best-fit orthonormalisation downstream —
    newer scipy raises on a non-positive determinant instead.  Make the
    implicit step explicit: project the zeroed block to the nearest
    y-rotation (polar decomposition of the xz 2x2, closed form via
    atan2), which is exactly the Frobenius-nearest rotation with the
    prescribed y structure.
    """
    ry = jnp.arctan2(P[0, 2] - P[2, 0], P[0, 0] + P[2, 2])
    c, s = jnp.cos(ry), jnp.sin(ry)
    R = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    R = R.at[0, 0].set(c).at[0, 2].set(s).at[2, 0].set(-s).at[2, 2].set(c)
    return P.at[:3, :3].set(R)


def _make_P_ry(ry, t):
    c, s = jnp.cos(ry), jnp.sin(ry)
    R = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)


def _draw_inits(rng, n_inits, t_amplitude, ry_amplitude):
    k1, k2 = jax.random.split(rng)
    ry = jax.random.uniform(k1, (n_inits,), minval=-ry_amplitude,
                            maxval=ry_amplitude) * 2.0
    t = jax.random.uniform(k2, (n_inits, 3), minval=-1.0, maxval=1.0) \
        * jnp.asarray(t_amplitude)
    return jax.vmap(_make_P_ry)(ry, t)


def _seeded_inits(rng, n_inits, P_seed, *, ry_jitter: float = 0.35,
                  t_jitter=(2.0, 0.0, 2.0)):
    """Inits clustered around a seed pose (e.g. the frustum solution or
    the yaw initial guess): init 0 is the exact seed, the rest are yaw/
    translation perturbations of it.  This is the basin-widening seeding
    the reference lacks — its ICP draws blind ±2π yaw inits
    (``registration_icp.py:115-139``) and rarely lands in the basin."""
    k1, k2 = jax.random.split(rng)
    ry = jax.random.uniform(k1, (n_inits,), minval=-ry_jitter,
                            maxval=ry_jitter)
    dt = jax.random.uniform(k2, (n_inits, 3), minval=-1.0, maxval=1.0) \
        * jnp.asarray(t_jitter)
    ry = ry.at[0].set(0.0)
    dt = dt.at[0].set(jnp.zeros(3))
    jit_P = jax.vmap(_make_P_ry)(ry, dt)           # (n, 4, 4)
    return jnp.einsum("nij,jk->nik", jit_P, P_seed,
                      precision=jax.lax.Precision.HIGHEST)


def icp_random_init(source, target, rng, *, n_inits: int = 60,
                    threshold: float = 1.0, max_iter: int = 30,
                    t_amplitude=(5.0, 0.0, 10.0),
                    ry_amplitude: float = jnp.pi) -> ICPResult:
    """60 random (tx, tz, ry) inits, best fitness, 2D-flattened
    (``registration_icp.py:115-139``)."""
    P_inits = _draw_inits(rng, n_inits, t_amplitude, ry_amplitude)
    res = jax.vmap(lambda P0: icp_point_to_point(
        source, target, P0, threshold=threshold, max_iter=max_iter))(P_inits)
    best = jnp.argmax(res.fitness)
    P_best = flatten_2d(res.P[best])
    fit = res.fitness[best]
    ok = fit > 0.001
    P_best = jnp.where(ok, P_best, jnp.eye(4))
    return ICPResult(P=P_best, fitness=fit)


@functools.partial(jax.jit,
                   static_argnames=("n_inits", "max_iter", "init_chunk",
                                    "seed_frac"))
def icp_batch(source, target, rng, *, n_inits: int = 60,
              threshold: float = 1.0, max_iter: int = 30,
              t_amplitude=(5.0, 0.0, 10.0), ry_amplitude: float = jnp.pi,
              init_chunk: int = 8, coarse_threshold=None,
              P_seed=None, seed_frac: float = 0.5) -> ICPResult:
    """Batched multi-init ICP: ONE dispatch for all pairs x inits.

    Replaces the per-pair python loop (each pair paid a dispatch and — with
    varying pseudo-cloud sizes — a retrace).  Pairs and init-groups run
    under ``lax.map`` (sequential, so the (N, M) distance matrices of only
    ``init_chunk`` problems are ever live); the inits inside a group are
    ``vmap``-ed.

    Args:
      source: (B, N, 3); target: (B, M, 3) pseudo clouds, padded to a common
        M with a far sentinel (e.g. 1e6) — sentinel points are never nearest
        neighbours and never inliers, so padding does not bias the solution.
      rng: PRNGKey; each pair gets a folded key.
      coarse_threshold: optional multi-scale anneal start (basin widening;
        None = the reference's fixed threshold).
      P_seed: optional (B, 4, 4) seed poses (frustum solution / yaw guess):
        ``seed_frac`` of the inits cluster around the pair's seed, the rest
        stay blind random draws so a bad seed cannot poison the solve.
    Returns:
      ICPResult with leading batch axis: P (B, 4, 4), fitness (B,).
    """
    B = source.shape[0]
    n_round = -(-n_inits // init_chunk) * init_chunk
    keys = jax.random.split(rng, B)
    n_seed = int(n_round * seed_frac) if P_seed is not None else 0
    seeds = (jnp.zeros((B, 4, 4)) if P_seed is None
             else jnp.asarray(P_seed, jnp.float32))

    def solve_pair(args):
        s, t, k, P_s = args
        k_blind, k_seed = jax.random.split(k)
        P_inits = _draw_inits(k_blind, n_round, t_amplitude, ry_amplitude)
        if n_seed:
            P_inits = jnp.concatenate(
                [_seeded_inits(k_seed, n_seed, P_s),
                 P_inits[n_seed:]], axis=0)

        def run_group(Ps):
            return jax.vmap(lambda P0: icp_point_to_point(
                s, t, P0, threshold=threshold, max_iter=max_iter,
                coarse_threshold=coarse_threshold))(Ps)

        res = jax.lax.map(run_group,
                          P_inits.reshape(-1, init_chunk, 4, 4))
        fit = res.fitness.reshape(-1)
        P = res.P.reshape(-1, 4, 4)
        best = jnp.argmax(fit)
        P_best = flatten_2d(P[best])
        ok = fit[best] > 0.001
        return ICPResult(P=jnp.where(ok, P_best, jnp.eye(4)),
                         fitness=fit[best])

    return jax.lax.map(solve_pair, (source, target, keys, seeds))
