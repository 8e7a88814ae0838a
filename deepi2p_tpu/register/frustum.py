"""Inverse-camera-projection registration: batched Levenberg-Marquardt.

TPU-native replacement for the Ceres solver
(``evaluation/frustum_reg/src/registration.cpp:9-186``) and the
multiprocessing fan-out that drives it
(``evaluation/registration_lsq.py:142-186,334-343``): all random
initialisations for all image-pointcloud pairs are solved simultaneously by
a ``vmap``-ed fixed-iteration LM loop on-chip.

Performance notes (v5e): the residual/Jacobian computation is laid out with
the POINT axis trailing, so every array is (..., N) and maps onto the
8x128 VPU lanes; the primal residual rides along with the ``jacfwd``
tangents (one fused pass), and the accepted proposal's residuals are
carried into the next iteration instead of being recomputed.  The normal
equations are tiny (P<=6) einsums.

Cost parity with the reference (2D mode, params ``[ry, tx, ty, tz]``;
3D mode, params ``[rx, ry, rz, tx, ty, tz]``):

  * inside-labelled point (3 residuals, ``registration_2d.hpp:93-129``):
    ``[relu(-px) + relu(px - W1), relu(-py) + relu(py - H1),
       relu(-z) * 100]`` with ``W1 = W-1, H1 = H-1`` — the functor's W/H
    slots receive ``H_1 = H-1, W_1 = W-1`` (``registration.cpp:21-22``);
    replicated exactly for cost parity (oracle-tested in
    ``tests/test_frustum_oracle.py``).
  * outside-labelled point (1 residual, ``registration_2d.hpp:21-69``):
    ``(xd + yd) * 1[z>0] * 1[xd>0] * 1[yd>0]`` with
    ``xd = W1/2 - |px - W1/2|`` (nonzero only when the point wrongly
    projects inside).  The reference's ``fmax(d,0)/d`` 0/1 gates have zero
    derivative a.e., so hard ``where`` gates replicate the Ceres autodiff.
  * Cauchy robustifier ``rho(s) = log(1+s)`` per residual block
    (``registration.cpp:104,121``); total cost ``0.5 * sum rho(|r_i|^2)``
    matching ``problem.Evaluate`` semantics (``registration.cpp:149-155``).
  * box bounds on translation (``registration.cpp:128-135``) via projection
    after each LM step.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# geometry helpers
# --------------------------------------------------------------------------

def rodrigues(aa: jax.Array) -> jax.Array:
    """Angle-axis (3,) -> rotation matrix (3,3), smooth near zero."""
    theta2 = jnp.sum(aa ** 2)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = aa / theta
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    # HIGHEST: the 3x3 K@K otherwise runs as a bf16 pass on TPU, putting
    # ~4e-4 of error in every rotation entry (seen on-chip by
    # test_rodrigues_matches_scipy); a 3x3 matmul is free at any precision
    KK = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    R = jnp.eye(3) + s * K + (1.0 - c) * KK
    # near-zero fallback: first-order expansion
    R0 = jnp.eye(3) + jnp.array([[0.0, -aa[2], aa[1]],
                                 [aa[2], 0.0, -aa[0]],
                                 [-aa[1], aa[0], 0.0]])
    return jnp.where(theta2 > 1e-16, R, R0)


def _unpack(theta: jax.Array, is_2d: bool):
    if is_2d:
        aa = jnp.stack([jnp.zeros(()), theta[0], jnp.zeros(())])
        return aa, theta[1:4]
    return theta[:3], theta[3:6]


def theta_to_pose(theta: jax.Array, is_2d: bool) -> jax.Array:
    """Params -> 4x4 pose (``registration.cpp:161-180``)."""
    aa, t = _unpack(theta, is_2d)
    P = jnp.eye(4)
    P = P.at[:3, :3].set(rodrigues(aa))
    return P.at[:3, 3].set(t)


# --------------------------------------------------------------------------
# residuals / cost  (points stored transposed: (3, N) — lane axis last)
# --------------------------------------------------------------------------

def _residuals_t(theta, pts_t, labels, valid, K, H, W, is_2d: bool,
                 edge_margin_px: float = 0.0):
    """Blockwise residuals, shape (3, N).  pts_t is (3, N);
    labels/valid are (N,) float.

    ``edge_margin_px`` relaxes both label tests by ``m`` pixels: an
    inside-labelled point is satisfied anywhere within the frame GROWN
    by m, an outside-labelled point is penalised only when deeper than m
    INSIDE the frame.  m=0 is the exact reference cost
    (``registration.cpp:95-118``).  Rationale (round-5 error anatomy,
    BENCH_NOTES): the trained classifier's errors concentrate in a
    ~40 px border band and are spatially coherent, so at the true pose
    they exert a net *bias* on the reference cost; a margin of the band
    width zeroes their gradient there instead."""
    aa, t = _unpack(theta, is_2d)
    R = rodrigues(aa)
    # HIGHEST: on TPU the default matmul precision runs bf16 passes, which
    # perturbs residuals vs the full-f32 pallas kernel (a 3xN matmul is
    # negligible work either way)
    p = jnp.matmul(R, pts_t,
                   precision=jax.lax.Precision.HIGHEST) + t[:, None]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = p[2]
    px = fx * p[0] / z + cx
    py = fy * p[1] / z + cy
    # reference passes H_1 = H-1, W_1 = W-1 into the residual functors
    # (registration.cpp:21-22,95-118)
    H1, W1 = H - 1.0, W - 1.0
    m = edge_margin_px

    # inside-labelled: pulled toward the (margin-grown) frame, z pushed
    # positive
    r_in0 = jnp.maximum(-m - px, 0.0) + jnp.maximum(px - W1 - m, 0.0)
    r_in1 = jnp.maximum(-m - py, 0.0) + jnp.maximum(py - H1 - m, 0.0)
    r_in2 = jnp.maximum(-z, 0.0) * 100.0

    # outside-labelled: penalised only when wrongly projecting deeper
    # than the margin inside
    xd = W1 * 0.5 - jnp.abs(px - W1 * 0.5) - m
    yd = H1 * 0.5 - jnp.abs(py - H1 * 0.5) - m
    gate = ((z > 0) & (xd > 0) & (yd > 0)).astype(p.dtype)
    r_out0 = (xd + yd) * gate

    is_in = labels > 0.5
    r0 = jnp.where(is_in, r_in0, r_out0)
    r1 = jnp.where(is_in, r_in1, 0.0)
    r2 = jnp.where(is_in, r_in2, 0.0)
    return jnp.stack([r0, r1, r2]) * valid[None, :]     # (3, N)


def _block_cost(r, valid, pw=None):
    """0.5 * sum pw * log(1 + |r_block|^2) over valid blocks; r is (3, N).

    ``pw`` (N,) optionally weights each point's robustified block — used
    to down-weight outside-labelled blocks when solving from a classifier
    with known-poor inside recall (a false negative's repulsive residual
    otherwise poisons the solve; round-3 analysis, BENCH_NOTES.md).
    """
    s = jnp.sum(r ** 2, axis=0)
    w = valid if pw is None else valid * pw
    return 0.5 * jnp.sum(jnp.log1p(s) * w)


def _outside_pw(labels, outside_weight: float):
    """Per-point block weight: 1 for inside-labelled, ``outside_weight``
    for outside-labelled.  None when the weight is exactly 1 (reference
    cost, ``registration_2d.hpp`` has no such weight)."""
    if outside_weight == 1.0:
        return None
    return jnp.where(labels > 0.5, 1.0, jnp.asarray(outside_weight,
                                                    labels.dtype))


def frustum_cost(theta, pts, labels, valid, K, H, W, is_2d: bool = True,
                 outside_weight: float = 1.0, edge_margin_px: float = 0.0):
    """Robustified total cost for points in (N, 3) layout (public API)."""
    r = _residuals_t(theta, pts.T, labels, valid, K, H, W, is_2d,
                     edge_margin_px)
    return _block_cost(r, valid, _outside_pw(labels, outside_weight))


# --------------------------------------------------------------------------
# Levenberg-Marquardt
# --------------------------------------------------------------------------

class LMResult(NamedTuple):
    theta: jax.Array
    cost: jax.Array
    n_accepted: jax.Array


def _spd_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD ``A x = b`` for tiny static P via unrolled Cholesky.

    ``jnp.linalg.solve`` lowers to a pivoted LU with sequential control flow
    that is pathologically slow inside a vmapped TPU scan; the unrolled
    Cholesky is ~P^3/3 fused elementwise ops.
    """
    P = A.shape[-1]
    L = [[None] * P for _ in range(P)]
    for i in range(P):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * P
    for i in range(P):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward substitution L^T x = y
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


@functools.partial(jax.jit, static_argnames=("H", "W", "max_iter", "is_2d",
                                             "outside_weight",
                                             "edge_margin_px"))
def lm_solve(pts, labels, valid, K, theta0, t_lb, t_ub, *,
             H: int, W: int, max_iter: int = 32,
             is_2d: bool = True, outside_weight: float = 1.0,
             point_weights=None, edge_margin_px: float = 0.0) -> LMResult:
    """Single-problem LM; ``vmap`` over initialisations x pairs for batches.

    Args:
      pts (N,3) f32, labels (N,) {0,1}, valid (N,) {0,1} (front-crop mask),
      K (3,3), theta0 (4,) or (6,), t_lb/t_ub (3,) translation bounds.
      point_weights: optional (N,) per-point block weights multiplied into
        the robust cost — e.g. classifier-confidence weights ``|2p-1|^g``
        so near-boundary (likely-wrong) labels pull the solve less.
      edge_margin_px: relax both label tests by this many pixels (see
        :func:`_residuals_t`); 0.0 is the exact reference cost.
    """
    P = theta0.shape[0]
    t_off = 1 if is_2d else 3
    pts_t = pts.T                                       # (3, N)
    pw = _outside_pw(labels, outside_weight)
    if point_weights is not None:
        pw = point_weights if pw is None else pw * point_weights
    vw = valid if pw is None else valid * pw

    def clip_t(theta):
        t = jnp.clip(theta[t_off:t_off + 3], t_lb, t_ub)
        return theta.at[t_off:t_off + 3].set(t)

    def res_fn(theta):
        r = _residuals_t(theta, pts_t, labels, valid, K, H, W, is_2d,
                         edge_margin_px)
        return r, r

    def step(state, _):
        theta, lam, cost, r, n_acc = state
        # one fused pass: primal residual (aux) + 4/6 forward tangents
        J, _ = jax.jacfwd(res_fn, has_aux=True)(theta)  # (3, N, P)
        s = jnp.sum(r ** 2, axis=0)                     # (N,)
        w = vw / (1.0 + s)                              # pw * Cauchy rho'(s)
        Hmat = jnp.einsum("rnp,rnq,n->pq", J, J, w,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("rnp,rn,n->p", J, r, w,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        damp = lam * jnp.diag(jnp.diagonal(Hmat)) + 1e-9 * jnp.eye(P)
        delta = -_spd_solve(Hmat + damp, g)
        theta_new = clip_t(theta + delta)
        r_new = _residuals_t(theta_new, pts_t, labels, valid, K, H, W, is_2d,
                             edge_margin_px)
        new_cost = _block_cost(r_new, valid, pw)
        accept = new_cost < cost
        theta = jnp.where(accept, theta_new, theta)
        cost = jnp.where(accept, new_cost, cost)
        r = jnp.where(accept, r_new, r)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 3.0), 1e-9, 1e9)
        return (theta, lam, cost, r, n_acc + accept.astype(jnp.int32)), None

    theta0 = clip_t(theta0)
    r0 = _residuals_t(theta0, pts_t, labels, valid, K, H, W, is_2d,
                      edge_margin_px)
    init = (theta0, jnp.asarray(1e-3), _block_cost(r0, valid, pw), r0,
            jnp.zeros((), jnp.int32))
    (theta, _, cost, _, n_acc), _ = jax.lax.scan(
        step, init, None, length=max_iter, unroll=min(8, max_iter))
    return LMResult(theta=theta, cost=cost, n_accepted=n_acc)


# --------------------------------------------------------------------------
# initial guess & full harness
# --------------------------------------------------------------------------

def initial_guess(pc, pred_inside):
    """Yaw init + front-crop validity mask
    (``evaluation/registration_lsq.py:196-220``).

    Args:
      pc (N,3), pred_inside (N,) {0,1}.
    Returns:
      (init_y_angle scalar, valid (N,) float mask).
    """
    m = pred_inside.astype(pc.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(pc * m[:, None], axis=0) / cnt
    src = jnp.arctan2(mean[2], mean[0])
    ang = src - jnp.pi / 2
    ang = jnp.mod(ang + jnp.pi, 2 * jnp.pi) - jnp.pi   # wrap_in_pi
    c, s = jnp.cos(ang), jnp.sin(ang)
    # z-row of Ry(ang) applied to pc
    rot_z = -s * pc[:, 0] + c * pc[:, 2]
    min_in_z = jnp.min(jnp.where(m > 0.5, rot_z, jnp.inf))
    valid = (rot_z > min_in_z - 10.0).astype(pc.dtype)
    return ang, valid


def sample_inits(rng, ang, n_inits: int, *,
                 init_t_amplitude: float = 10.0,
                 ry_sigma: float = 10.0 * jnp.pi / 180.0,
                 is_2d: bool = True) -> jax.Array:
    """Random initialisations for ONE pair (``registration_lsq.py:160-168``).

    Args:
      rng: per-pair PRNG key; ang: scalar yaw initial guess.
    Returns:
      theta0 (n_inits, 4) 2D / (n_inits, 6) 3D.
    """
    k1, k2 = jax.random.split(rng)
    ry = ang + ry_sigma * jax.random.normal(k1, (n_inits,))
    tz = jax.random.uniform(k2, (n_inits,), minval=-init_t_amplitude,
                            maxval=init_t_amplitude)
    zeros = jnp.zeros_like(ry)
    if is_2d:
        return jnp.stack([ry, zeros, zeros, tz], axis=-1)
    return jnp.stack([zeros, ry, zeros, zeros, zeros, tz], axis=-1)


def solve_frustum_batch(pc, pred_inside, K, *, H: int, W: int, rng=None,
                        n_inits: int = 60, max_iter: int = 32,
                        init_t_amplitude: float = 10.0,
                        ry_sigma: float = 10.0 * jnp.pi / 180.0,
                        t_lb=(-5.0, -0.1, -10.0), t_ub=(5.0, 0.1, 10.0),
                        is_2d: bool = True, solver_stride: int = 1,
                        backend: str = "auto", theta0=None,
                        probe_stride: int | None = None,
                        survivors: int | None = None,
                        outside_weight: float = 1.0,
                        point_weights=None,
                        edge_margin_px: float = 0.0):
    """Full multi-init solve for a batch of pairs.

    Mirrors ``solve_P_random_perturb`` (``registration_lsq.py:142-186``):
    per init ``ry ~ N(init_y_angle, ry_sigma)``, ``t = [0, 0, U(-a, a)]``;
    the min-cost init wins.  Pairs with zero predicted insiders fall back to
    identity with cost 1e4 (``registration_lsq.py:329-332``).

    ``solver_stride`` optionally subsamples the points fed to the LM
    iterations (the cost is a sum over points, so a uniform stride leaves
    the minimiser statistically unchanged while dividing the work).
    ``probe_stride`` additionally subsamples the *ranking* phase of the
    successive-halving pallas path only — survivor refinement (which alone
    produces the returned poses) always runs at ``solver_stride``.  The
    default targets a TOTAL probe subsample of every 4th point regardless
    of ``solver_stride``.  Round 2 pinned every-8th on the 10%-iid gate
    (perf_probe8.py); round 5's structured-noise re-pin
    (scripts/probe_halving.py, on chip) showed every-8th probing drops
    the sector-noise gate from 20/32 to 13/32 *independently of survivor
    width* — the probe's 8 LM iterations converge every survivor theta
    into subsample-distorted minima that refinement cannot escape — while
    every-4th matches full-density ranking (20 vs 19 of 32).
    ``survivors`` sets how many inits graduate from the probe phase
    (default: the best eighth, rounded to the pallas init block; width
    was quality-neutral at every probed stride).

    ``backend``: 'auto' picks the single-launch Pallas mega-kernel on TPU
    (``frustum_pallas``) and the XLA scan path elsewhere; 'pallas'/'xla'
    force one.

    ``theta0`` (B, I, P) overrides the internal random-init draw (``rng``
    then unused) — for deterministic replays and for data-parallel sharding
    where per-pair inits must not depend on the batch layout
    (:mod:`deepi2p_tpu.parallel.registration`).

    ``outside_weight`` < 1 down-weights outside-labelled residual blocks
    in the robust cost (see :func:`_block_cost`) — a mitigation for
    recall-limited classifiers whose false negatives repel the solve.
    1.0 (default) is the exact reference cost; any other value routes
    through the generic LM path (the fast/pallas kernels implement the
    unweighted reference cost only).

    ``edge_margin_px`` > 0 relaxes both label tests by that many pixels
    (see :func:`_residuals_t`) — a mitigation for classifiers whose
    errors concentrate in a border band, where they bias the exact cost.
    0.0 (default) is the reference cost; nonzero routes through the
    generic LM path like ``outside_weight``.

    Args:
      pc (B,N,3), pred_inside (B,N) int, K (B,3,3).
    Returns:
      (P (B,4,4), cost (B,)).
    """
    B = pc.shape[0]
    if probe_stride is None:
        probe_stride = max(1, 4 // solver_stride)
    t_lb_t = tuple(float(v) for v in t_lb)
    t_ub_t = tuple(float(v) for v in t_ub)
    t_lb = jnp.asarray(t_lb_t)
    t_ub = jnp.asarray(t_ub_t)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if (outside_weight != 1.0 or point_weights is not None
            or edge_margin_px != 0.0):
        backend = "generic"     # autodiff lm_solve path below
    # backend == 'generic' may also be requested explicitly (no halving,
    # full budget on every init — the apples-to-apples baseline for
    # weighted-cost experiments)

    ang, valid = jax.vmap(initial_guess)(pc, pred_inside)  # (B,), (B,N)

    if theta0 is None:
        assert rng is not None, "need rng when theta0 is not given"
        keys = jax.random.split(rng, B)
        theta0 = jax.vmap(lambda k, a: sample_inits(
            k, a, n_inits, init_t_amplitude=init_t_amplitude,
            ry_sigma=ry_sigma, is_2d=is_2d))(keys, ang)     # (B, I, P)

    if backend == "pallas":
        from .frustum_pallas import I_BLK
        # pallas wants a multiple of I_BLK inits; extra inits only help
        # (pad by repeating the first init — never a new random draw, so a
        # caller-provided theta0 stays layout-independent)
        I = theta0.shape[1]
        pad = (-I) % I_BLK
        if pad:
            theta0 = jnp.concatenate(
                [theta0, jnp.repeat(theta0[:, :1], pad, axis=1)], axis=1)

    pc_s = pc[:, ::solver_stride]
    labels_s = pred_inside.astype(pc.dtype)[:, ::solver_stride]
    valid_s = valid[:, ::solver_stride]

    if backend == "pallas":
        # successive halving, same policy as the XLA path below: probe
        # every init for a few iterations on a probe_stride point subsample
        # (ranking only), then spend the remaining budget on the best
        # eighth (I // 8 by default, see `keep` below), refined on the full
        # point set.  Both kernel launches live in ONE jitted
        # program, so the second launch costs no extra dispatch; the
        # iteration work drops to probe*I + (max_iter-probe)*I/4.
        from .frustum_pallas import lm_solve_pallas
        I = theta0.shape[1]
        probe_iter = min(8, max_iter)
        if max_iter > probe_iter and I >= 4 * I_BLK:
            # the probe phase only RANKS inits, so it runs on a further
            # point subsample (the cost is a sum over points — a uniform
            # stride preserves the basin ordering in expectation); the
            # survivors are refined on the full point set, which alone
            # determines the returned poses/costs.
            ps = probe_stride
            thetas, costs = lm_solve_pallas(pc_s[:, ::ps], labels_s[:, ::ps],
                                            valid_s[:, ::ps], K,
                                            theta0, t_lb_t, t_ub_t, H=H,
                                            W=W, max_iter=probe_iter)
            # default: best eighth graduates (an 8-wide survivor set kept
            # 32/32 success at 10% label noise on bench-scale problems —
            # scripts/perf_probe8.py sweep on the real chip)
            if survivors is None:
                keep = max((I // 8) // I_BLK * I_BLK, I_BLK)
            else:
                keep = max(min(survivors, I) // I_BLK * I_BLK, I_BLK)
            top = jnp.argsort(costs, axis=1)[:, :keep]         # (B, keep)
            theta_top = jnp.take_along_axis(
                thetas, top[:, :, None], axis=1)               # (B, keep, P)
            thetas, costs = lm_solve_pallas(
                pc_s, labels_s, valid_s, K, theta_top, t_lb_t, t_ub_t,
                H=H, W=W, max_iter=max_iter - probe_iter)
        else:
            thetas, costs = lm_solve_pallas(pc_s, labels_s, valid_s, K,
                                            theta0, t_lb_t, t_ub_t, H=H,
                                            W=W, max_iter=max_iter)
    elif is_2d and backend != "generic":
        # analytic-Jacobian fast path (frustum_fast.py), with
        # successive halving: probe every init for a few iterations, then
        # spend the remaining budget only on the most promising quarter.
        from .frustum_fast import lm_solve_fast
        probe_iter = min(8, max_iter)
        thetas, costs, _ = lm_solve_fast(pc_s, labels_s, valid_s, K,
                                         theta0, t_lb, t_ub,
                                         H=H, W=W, max_iter=probe_iter)
        if max_iter > probe_iter and theta0.shape[1] >= 8:
            keep = (max(theta0.shape[1] // 4, 4) if survivors is None
                    else max(min(survivors, theta0.shape[1]), 4))
            top = jnp.argsort(costs, axis=1)[:, :keep]         # (B, keep)
            theta_top = jnp.take_along_axis(
                thetas, top[:, :, None], axis=1)               # (B, keep, P)
            thetas, costs, _ = lm_solve_fast(
                pc_s, labels_s, valid_s, K, theta_top, t_lb, t_ub,
                H=H, W=W, max_iter=max_iter - probe_iter)
    else:
        pw_s = (None if point_weights is None
                else jnp.asarray(point_weights,
                                 pc.dtype)[:, ::solver_stride])
        solve_one = functools.partial(lm_solve, H=H, W=W, max_iter=max_iter,
                                      is_2d=is_2d,
                                      outside_weight=outside_weight,
                                      edge_margin_px=float(edge_margin_px))
        # vmap over inits, then over pairs
        inner = jax.vmap(lambda th, p, l, v, k, w:
                         solve_one(p, l, v, k, th, t_lb, t_ub,
                                   point_weights=w),
                         in_axes=(0, None, None, None, None, None))
        outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0,
                                         None if pw_s is None else 0))
        res = outer(theta0, pc_s, labels_s, valid_s, K, pw_s)
        thetas, costs = res.theta, res.cost

    best = jnp.argmin(costs, axis=1)                           # (B,)
    best_theta = jnp.take_along_axis(
        thetas, best[:, None, None], axis=1)[:, 0]             # (B, P)
    best_cost = jnp.take_along_axis(costs, best[:, None], axis=1)[:, 0]
    P_out = jax.vmap(lambda th: theta_to_pose(th, is_2d))(best_theta)

    has_inside = jnp.sum(pred_inside, axis=1) > 0
    eye = jnp.broadcast_to(jnp.eye(4), P_out.shape)
    P_out = jnp.where(has_inside[:, None, None], P_out, eye)
    best_cost = jnp.where(has_inside, best_cost, 1e4)
    return P_out, best_cost
