"""Pallas TPU mega-kernel for the frustum LM solve.

One ``pallas_call`` executes the ENTIRE multi-init Levenberg-Marquardt
optimisation: the grid walks (pair, init-block) programs; inside each
program the point cloud stays resident in VMEM while a ``fori_loop`` runs
all LM iterations, with the per-iteration normal equations accumulated over
VMEM-sized point tiles.  Compared with the XLA scan implementation
(``frustum_fast.lm_solve_fast``) this removes every per-iteration kernel
launch and every HBM round trip of the (inits, N) intermediates — the
dominant costs on launch-bound backends, and a large HBM-traffic saving on
real TPUs.

Mosaic-specific structure: no small 3D tensors and no gathers — the PxP
normal matrix (P=4 for the 2D [ry, t] mode, P=6 for the 3D angle-axis
mode, ``registration_3d.hpp``) lives as P(P+1)/2 upper-triangular
(I_BLK, 1) component vectors and the damped Cholesky solve is unrolled over
components; all intermediate arrays are 2D with the point tile on the lane
axis.  The 2D mode uses the hand-derived analytic Jacobian; the 3D mode
linearises the residual map with ``jax.linearize`` (1 primal + 6 tangent
passes, still all-elementwise).

Semantics match ``frustum_fast.lm_solve_fast`` (same residuals / Cauchy
weights / LM acceptance rule, see that module's derivation docstring);
parity is tested in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I_BLK = 8            # inits per grid program (one sublane tile)
POINT_TILE = 1024    # lane-axis tile for the accumulation loops


def _residual_rows(p0, p1, p2, lab, val, fx, fy, cx, cy, H1, W1):
    """Camera-frame points -> the three residual rows (I_BLK, T).

    Shared by the 2D analytic path and the 3D linearised path; the
    expressions are jvp-differentiable (a.e. derivatives match Ceres
    autodiff, see frustum_fast.py derivation docstring)."""
    inv_z = 1.0 / p2
    px = fx * p0 * inv_z + cx
    py = fy * p1 * inv_z + cy

    r0_in = jnp.maximum(-px, 0.0) + jnp.maximum(px - W1, 0.0)
    r1_in = jnp.maximum(-py, 0.0) + jnp.maximum(py - H1, 0.0)
    r2_in = jnp.maximum(-p2, 0.0) * 100.0

    xd = W1 * 0.5 - jnp.abs(px - W1 * 0.5)
    yd = H1 * 0.5 - jnp.abs(py - H1 * 0.5)
    gate = ((p2 > 0) & (xd > 0) & (yd > 0)).astype(px.dtype)
    r_out = (xd + yd) * gate

    is_in = lab > 0.5
    r0 = jnp.where(is_in, r0_in, r_out) * val
    r1 = jnp.where(is_in, r1_in, 0.0) * val
    r2 = jnp.where(is_in, r2_in, 0.0) * val
    return r0, r1, r2


def _tile_terms(theta, xs, ys, zs, lab, val, fx, fy, cx, cy, H1, W1):
    """Residual rows, Jacobian rows and Cauchy weights for one point tile
    (2D mode, analytic Jacobian).

    theta (I_BLK, 4); xs/ys/zs/lab/val (1, T); scalars fx..cy.
    Returns (r0, r1, r2, J0, J1, J2, w, logcost) with r*/w/logcost
    (I_BLK, T) and J* lists of four (I_BLK, T) arrays.
    """
    ry = theta[:, 0:1]
    tx = theta[:, 1:2]
    ty = theta[:, 2:3]
    tz = theta[:, 3:4]
    c, s = jnp.cos(ry), jnp.sin(ry)
    p0 = c * xs + s * zs + tx
    p1 = ys + ty
    p2 = -s * xs + c * zs + tz
    inv_z = 1.0 / p2
    px = fx * p0 * inv_z + cx
    py = fy * p1 * inv_z + cy
    a = fx * inv_z
    b = fy * inv_z
    u = p0 * inv_z
    v = p1 * inv_z
    dry0 = p2 - tz
    dry2 = -(p0 - tx)
    # structurally-zero Jacobian entries are ``None`` (not traced zeros):
    # Mosaic does not fold 0*x, so skipping them in the normal-equation
    # accumulation removes ~1/3 of the multiply-adds.
    dpx = (a * (dry0 - u * dry2), a, None, -a * u)
    dpy = (b * (-v * dry2), None, b, -b * v)
    dz = (dry2, None, None, jnp.ones_like(a))

    r0_in = jnp.maximum(-px, 0.0) + jnp.maximum(px - W1, 0.0)
    s0 = jnp.where(px < 0, -1.0, 0.0) + jnp.where(px > W1, 1.0, 0.0)
    r1_in = jnp.maximum(-py, 0.0) + jnp.maximum(py - H1, 0.0)
    s1 = jnp.where(py < 0, -1.0, 0.0) + jnp.where(py > H1, 1.0, 0.0)
    r2_in = jnp.maximum(-p2, 0.0) * 100.0
    s2 = jnp.where(p2 < 0, -100.0, 0.0)

    xd = W1 * 0.5 - jnp.abs(px - W1 * 0.5)
    yd = H1 * 0.5 - jnp.abs(py - H1 * 0.5)
    gate = ((p2 > 0) & (xd > 0) & (yd > 0)).astype(px.dtype)
    r_out = (xd + yd) * gate
    sxd = -jnp.sign(px - W1 * 0.5) * gate
    syd = -jnp.sign(py - H1 * 0.5) * gate

    is_in = lab > 0.5
    r0 = jnp.where(is_in, r0_in, r_out)
    r1 = jnp.where(is_in, r1_in, 0.0)
    r2 = jnp.where(is_in, r2_in, 0.0)

    def _out_term(dx, dy):
        if dx is None and dy is None:
            return None
        if dx is None:
            return syd * dy
        if dy is None:
            return sxd * dx
        return sxd * dx + syd * dy

    J0 = []
    for dx, dy in zip(dpx, dpy):
        out = _out_term(dx, dy)
        if dx is None and out is None:
            J0.append(None)
        else:
            J0.append(jnp.where(is_in, 0.0 if dx is None else s0 * dx,
                                0.0 if out is None else out))
    J1 = [None if dy is None else jnp.where(is_in, s1 * dy, 0.0)
          for dy in dpy]
    J2 = [None if dzk is None else jnp.where(is_in, s2 * dzk, 0.0)
          for dzk in dz]

    s_blk = r0 * r0 + r1 * r1 + r2 * r2
    w = val / (1.0 + s_blk)
    logcost = 0.5 * jnp.log1p(s_blk) * val
    return r0, r1, r2, J0, J1, J2, w, logcost


def _rot_entries(theta):
    """Angle-axis columns (I_BLK, >=3) -> 9 rotation entries (I_BLK, 1),
    row-major; smooth first-order fallback near zero (frustum.rodrigues)."""
    rx, ry, rz = theta[:, 0:1], theta[:, 1:2], theta[:, 2:3]
    t2 = rx * rx + ry * ry + rz * rz
    th = jnp.sqrt(t2 + 1e-24)
    s, c = jnp.sin(th), jnp.cos(th)
    kx, ky, kz = rx / th, ry / th, rz / th
    oc = 1.0 - c
    big = t2 > 1e-16
    one = jnp.ones_like(rx)

    def sel(a, b):
        return jnp.where(big, a, b)

    return (sel(c + kx * kx * oc, one),
            sel(kx * ky * oc - kz * s, -rz),
            sel(kx * kz * oc + ky * s, ry),
            sel(ky * kx * oc + kz * s, rz),
            sel(c + ky * ky * oc, one),
            sel(ky * kz * oc - kx * s, -rx),
            sel(kz * kx * oc - ky * s, -ry),
            sel(kz * ky * oc + kx * s, rx),
            sel(c + kz * kz * oc, one))


def _tile_terms_3d(theta, xs, ys, zs, lab, val, fx, fy, cx, cy, H1, W1):
    """6-DoF variant: angle-axis rotation (``registration_3d.hpp:40-44``),
    Jacobian via ``jax.linearize`` of the per-tile residual map (one primal
    pass + 6 cheap tangent passes; everything stays elementwise 2D, so the
    Mosaic constraints hold).

    theta (I_BLK, 6).  Returns the same tuple shape as :func:`_tile_terms`
    with 6-element Jacobian lists.
    """
    def rows(th):
        R = _rot_entries(th)
        tx, ty, tz = th[:, 3:4], th[:, 4:5], th[:, 5:6]
        p0 = R[0] * xs + R[1] * ys + R[2] * zs + tx
        p1 = R[3] * xs + R[4] * ys + R[5] * zs + ty
        p2 = R[6] * xs + R[7] * ys + R[8] * zs + tz
        return _residual_rows(p0, p1, p2, lab, val, fx, fy, cx, cy, H1, W1)

    (r0, r1, r2), lin = jax.linearize(rows, theta)
    J0, J1, J2 = [], [], []
    for j in range(6):
        cols = [jnp.ones_like(theta[:, :1]) if k == j
                else jnp.zeros_like(theta[:, :1]) for k in range(6)]
        d0, d1, d2 = lin(jnp.concatenate(cols, axis=-1))
        J0.append(d0)
        J1.append(d1)
        J2.append(d2)

    s_blk = r0 * r0 + r1 * r1 + r2 * r2
    w = val / (1.0 + s_blk)
    logcost = 0.5 * jnp.log1p(s_blk) * val
    return r0, r1, r2, J0, J1, J2, w, logcost


def _tri(P):
    return [(i, j) for i in range(P) for j in range(i, P)]


def _chol_solve(H, g, lam, P):
    """Damped SPD solve with H as dict {(i,j): (I_BLK,1)} (upper tri),
    g list of P (I_BLK,1), lam (I_BLK,1) -> delta list of P (unrolled
    Cholesky — no small matrices, Mosaic-friendly)."""
    A = dict(H)
    for i in range(P):
        A[(i, i)] = A[(i, i)] * (1.0 + lam) + 1e-9

    L = {}
    for i in range(P):
        for j in range(i + 1):
            s = A[(j, i)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[(i, j)] = s / L[(j, j)]
    y = [None] * P
    for i in range(P):
        s = g[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _kernel(pts_ref, labval_ref, kparams_ref, theta0_ref,
            theta_out_ref, cost_out_ref, *, n_tiles: int, max_iter: int,
            H1: float, W1: float, t_lb, t_ub, n_params: int):
    bprog = pl.program_id(0)
    fx = kparams_ref[bprog, 0]
    fy = kparams_ref[bprog, 1]
    cx = kparams_ref[bprog, 2]
    cy = kparams_ref[bprog, 3]
    P = n_params
    t_off = P - 3                      # 1 (2D: [ry, t]) or 3 (3D: [aa, t])
    tri = _tri(P)
    terms = _tile_terms if P == 4 else _tile_terms_3d

    def clip_t(theta):
        cols = [theta[:, i:i + 1] for i in range(t_off)]
        for i in range(3):
            cols.append(jnp.clip(theta[:, t_off + i:t_off + i + 1],
                                 float(t_lb[i]), float(t_ub[i])))
        return jnp.concatenate(cols, axis=-1)

    def tile_views(t):
        sl = pl.ds(t * POINT_TILE, POINT_TILE)
        xs = pts_ref[0, 0:1, sl]               # (1, T)
        ys = pts_ref[0, 1:2, sl]
        zs = pts_ref[0, 2:3, sl]
        lab = labval_ref[0, 0:1, sl]
        val = labval_ref[0, 1:2, sl]
        return xs, ys, zs, lab, val

    def accum_normal(theta):
        """One sweep over the cloud: normal equations H, gradient g and
        robustified cost, all at ``theta``.  Structurally-zero Jacobian
        entries (``None``) are skipped — J0 is dense, so every H component
        receives at least one term."""
        def body(t, acc):
            Hacc, gacc, cacc = acc
            xs, ys, zs, lab, val = tile_views(t)
            r0, r1, r2, J0, J1, J2, w, logcost = terms(
                theta, xs, ys, zs, lab, val, fx, fy, cx, cy, H1, W1)
            rows = ((J0, r0), (J1, r1), (J2, r2))
            Hnew = {}
            for i, j in tri:
                s = None
                for Jr, _ in rows:
                    if Jr[i] is None or Jr[j] is None:
                        continue
                    term = Jr[i] * Jr[j]
                    s = term if s is None else s + term
                Hnew[(i, j)] = Hacc[(i, j)] + jnp.sum(
                    w * s, axis=-1, keepdims=True)
            gnew = []
            for k in range(P):
                s = None
                for Jr, rr in rows:
                    if Jr[k] is None:
                        continue
                    term = Jr[k] * rr
                    s = term if s is None else s + term
                gnew.append(gacc[k] + jnp.sum(w * s, axis=-1, keepdims=True))
            cnew = cacc + jnp.sum(logcost, axis=-1, keepdims=True)
            return Hnew, gnew, cnew
        z = lambda: jnp.zeros((I_BLK, 1))
        init = ({ij: z() for ij in tri}, [z() for _ in range(P)], z())
        return jax.lax.fori_loop(0, n_tiles, body, init)

    theta = clip_t(theta0_ref[0])
    lam = jnp.full((I_BLK, 1), 1e-3)
    # H and g depend only on theta, so they are carried in the LM state:
    # each iteration costs exactly ONE cloud sweep (at the proposal), and a
    # rejected step reuses the carried H/g instead of recomputing them.
    # Iterates are identical to the two-sweep formulation (accum at theta
    # + cost-only at theta_new) at ~half the point-sweep work.
    Hm, g, cost = accum_normal(theta)

    def lm_iter(_, state):
        theta, lam, cost, Hm, g = state
        delta = _chol_solve(Hm, g, lam, P)
        theta_new = clip_t(theta - jnp.concatenate(delta, axis=-1))
        Hn, gn, new_cost = accum_normal(theta_new)
        accept = new_cost < cost
        theta = jnp.where(accept, theta_new, theta)
        cost = jnp.where(accept, new_cost, cost)
        Hm = {ij: jnp.where(accept, Hn[ij], Hm[ij]) for ij in tri}
        g = [jnp.where(accept, gn[k], g[k]) for k in range(P)]
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 3.0), 1e-9, 1e9)
        return theta, lam, cost, Hm, g

    theta, lam, cost, Hm, g = jax.lax.fori_loop(
        0, max_iter, lm_iter, (theta, lam, cost, Hm, g))
    theta_out_ref[0] = theta
    cost_out_ref[0, 0, 0] = cost[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("t_lb", "t_ub", "H", "W", "max_iter",
                                    "interpret"))
def lm_solve_pallas(pts, labels, valid, K, theta0, t_lb, t_ub, *,
                    H: int, W: int, max_iter: int = 16,
                    interpret: bool = False):
    """Drop-in replacement for ``lm_solve_fast`` / ``lm_solve``.

    Args:
      pts (B, N, 3); labels/valid (B, N); K (B, 3, 3); theta0 (B, I, P)
      with I a multiple of ``I_BLK`` and P = 4 (2D: [ry, t],
      ``registration_2d.hpp``) or 6 (3D: [angle-axis, t],
      ``registration_3d.hpp``); t_lb/t_ub static python tuples.
    Returns:
      (theta (B, I, P), cost (B, I)).
    """
    B, N, _ = pts.shape
    I, P = theta0.shape[1], theta0.shape[2]
    assert P in (4, 6), f"theta0 must have 4 (2D) or 6 (3D) params, got {P}"
    pad = (-N) % POINT_TILE
    pts_t = jnp.moveaxis(pts, -1, 1)                       # (B, 3, N)
    labval = jnp.stack([labels, valid], axis=1)            # (B, 2, N)
    if pad:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, pad)))
        labval = jnp.pad(labval, ((0, 0), (0, 0), (0, pad)))
    Np = N + pad
    n_tiles = Np // POINT_TILE
    kparams = jnp.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]],
                        axis=-1)                           # (B, 4)
    assert I % I_BLK == 0, f"inits ({I}) must be a multiple of {I_BLK}"

    kernel = functools.partial(
        _kernel, n_tiles=n_tiles, max_iter=max_iter,
        # reference passes H_1 = H-1, W_1 = W-1 (registration.cpp:21-22)
        H1=float(H - 1), W1=float(W - 1),
        t_lb=tuple(float(v) for v in t_lb),
        t_ub=tuple(float(v) for v in t_ub),
        n_params=P)

    theta, cost = pl.pallas_call(
        kernel,
        grid=(B, I // I_BLK),
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Np), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # full (B, 4) block: SMEM blocks must be tile-aligned or
            # equal to the full array; indexed by program_id in-kernel
            pl.BlockSpec((B, 4), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, I_BLK, P), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, I_BLK, P), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # 4D with trailing dims (1, I_BLK) equal to the full array's
            # (tile-alignment rule holds for any I)
            pl.BlockSpec((1, 1, 1, I_BLK), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, I, P), jnp.float32),
            jax.ShapeDtypeStruct((B, I // I_BLK, 1, I_BLK), jnp.float32),
        ),
        interpret=interpret,
    )(pts_t, labval, kparams, theta0)
    return theta, cost.reshape(B, I)
