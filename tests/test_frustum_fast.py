"""Analytic-Jacobian LM vs the autodiff reference implementation."""
import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.register.frustum import (lm_solve, frustum_cost,
                                          theta_to_pose)
from deepi2p_tpu.register.frustum_fast import (lm_solve_fast,
                                               _normal_equations,
                                               _residual_cost)
from deepi2p_tpu.register.metrics import pose_diff_np
from deepi2p_tpu.ops.projection import project_points, coarse_labels

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)


def _problem(rng, yaw, t, n=512):
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 40, n)
    pc = np.stack([r * np.cos(theta), rng.uniform(-2, 2, n),
                   r * np.sin(theta)], axis=-1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    P[:3, 3] = t
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    labels = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    return pc, labels, P


def test_normal_equations_match_autodiff(rng):
    """Analytic H, g, cost == jacfwd-based quantities."""
    pc, labels, _ = _problem(rng, 0.6, np.array([0.5, 0, 1.0], np.float32))
    valid = np.ones(len(pc), np.float32)
    theta = jnp.asarray([0.55, 0.1, 0.0, 0.4])

    # autodiff reference
    from deepi2p_tpu.register.frustum import _residuals_t
    res_fn = lambda th: _residuals_t(th, jnp.asarray(pc).T,
                                     jnp.asarray(labels, jnp.float32),
                                     jnp.asarray(valid), jnp.asarray(K_np),
                                     H, W, True)
    r = res_fn(theta)
    J = jax.jacfwd(res_fn)(theta)          # (3, N, 4)
    s = jnp.sum(r ** 2, axis=0)
    w = valid / (1.0 + s)
    # HIGHEST: on the real chip default-precision einsums run bf16 passes,
    # which would corrupt the *reference* quantities (CPU is f32 exact)
    H_ref = np.asarray(jnp.einsum("rnp,rnq,n->pq", J, J, w,
                                  precision=jax.lax.Precision.HIGHEST))
    g_ref = np.asarray(jnp.einsum("rnp,rn,n->p", J, r, w,
                                  precision=jax.lax.Precision.HIGHEST))
    cost_ref = float(frustum_cost(theta, jnp.asarray(pc),
                                  jnp.asarray(labels), jnp.asarray(valid),
                                  jnp.asarray(K_np), H, W))

    xs = jnp.asarray(pc[None, None, :, 0])
    ys = jnp.asarray(pc[None, None, :, 1])
    zs = jnp.asarray(pc[None, None, :, 2])
    lab = jnp.asarray(labels, jnp.float32)[None, None]
    val = jnp.asarray(valid)[None, None]
    fx = jnp.full((1, 1, 1), K_np[0, 0])
    fy = jnp.full((1, 1, 1), K_np[1, 1])
    cx = jnp.full((1, 1, 1), K_np[0, 2])
    cy = jnp.full((1, 1, 1), K_np[1, 2])
    H_f, g_f, cost_f = _normal_equations(theta[None, None], xs, ys, zs,
                                         lab, val, fx, fy, cx, cy,
                                         float(H - 1), float(W - 1))
    np.testing.assert_allclose(np.asarray(H_f[0, 0]), H_ref, rtol=1e-3,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(g_f[0, 0]), g_ref, rtol=1e-3,
                               atol=1e-2)
    np.testing.assert_allclose(float(cost_f[0, 0]), cost_ref, rtol=1e-5)
    c2 = _residual_cost(theta[None, None], xs, ys, zs, lab, val,
                        fx, fy, cx, cy, float(H - 1), float(W - 1))
    np.testing.assert_allclose(float(c2[0, 0]), cost_ref, rtol=1e-5)


def test_fast_lm_matches_autodiff_lm(rng):
    """Both solvers converge to equivalent poses from the same inits."""
    pc, labels, P_gt = _problem(rng, 0.8, np.array([0.3, 0.0, 0.8], np.float32))
    valid = jnp.ones(len(pc))
    t_lb = jnp.asarray([-5.0, -0.1, -10.0])
    t_ub = jnp.asarray([5.0, 0.1, 10.0])
    theta0 = jnp.asarray([[[0.7, 0.0, 0.0, 0.0],
                           [0.9, 0.0, 0.0, 0.5]]])   # (1, 2, 4)

    th_f, cost_f, acc_f = lm_solve_fast(
        jnp.asarray(pc[None]), jnp.asarray(labels, jnp.float32)[None],
        valid[None], jnp.asarray(K_np[None]), theta0, t_lb, t_ub,
        H=H, W=W, max_iter=48)

    for i in range(2):
        ref = lm_solve(jnp.asarray(pc), jnp.asarray(labels, jnp.float32),
                       valid, jnp.asarray(K_np), theta0[0, i], t_lb, t_ub,
                       H=H, W=W, max_iter=48)
        # equivalent quality (identical trajectories not required)
        assert float(cost_f[0, i]) <= float(ref.cost) * 1.2 + 1.0
        P_est = np.asarray(theta_to_pose(th_f[0, i], True), np.float64)
        rte, rre = pose_diff_np(P_est, np.asarray(P_gt, np.float64))
        assert rre < 5.0, (i, rte, rre)
