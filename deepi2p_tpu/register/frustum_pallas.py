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

Mosaic-specific structure: no small 3D tensors and no gathers — the 4x4
normal matrix lives as 10 upper-triangular (I_BLK, 1) component vectors and
the damped Cholesky solve is unrolled over components; all intermediate
arrays are 2D with the point tile on the lane axis.

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


def _tile_terms(theta, xs, ys, zs, lab, val, fx, fy, cx, cy, H1, W1):
    """Residual rows, Jacobian rows and Cauchy weights for one point tile.

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
    zero = jnp.zeros_like(a)
    dpx = (a * (dry0 - u * dry2), a, zero, -a * u)
    dpy = (b * (-v * dry2), zero, b, -b * v)
    dz = (dry2, zero, zero, jnp.ones_like(a))

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
    J0 = [jnp.where(is_in, s0 * dx, sxd * dx + syd * dy)
          for dx, dy in zip(dpx, dpy)]
    J1 = [jnp.where(is_in, s1 * dy, 0.0) for dy in dpy]
    J2 = [jnp.where(is_in, s2 * dzk, 0.0) for dzk in dz]

    s_blk = r0 * r0 + r1 * r1 + r2 * r2
    w = val / (1.0 + s_blk)
    logcost = 0.5 * jnp.log1p(s_blk) * val
    return r0, r1, r2, J0, J1, J2, w, logcost


_TRI = [(i, j) for i in range(4) for j in range(i, 4)]


def _chol_solve10(H, g, lam):
    """Damped SPD solve with H as dict {(i,j): (I_BLK,1)} (upper tri),
    g list of four (I_BLK,1), lam (I_BLK,1) -> delta list of four."""
    A = dict(H)
    for i in range(4):
        A[(i, i)] = A[(i, i)] * (1.0 + lam) + 1e-9

    L = {}
    for i in range(4):
        for j in range(i + 1):
            s = A[(j, i)]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[(i, j)] = s / L[(j, j)]
    y = [None] * 4
    for i in range(4):
        s = g[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    x = [None] * 4
    for i in reversed(range(4)):
        s = y[i]
        for k in range(i + 1, 4):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _kernel(pts_ref, labval_ref, kparams_ref, theta0_ref,
            theta_out_ref, cost_out_ref, *, n_tiles: int, max_iter: int,
            H1: float, W1: float, t_lb, t_ub):
    bprog = pl.program_id(0)
    fx = kparams_ref[bprog, 0]
    fy = kparams_ref[bprog, 1]
    cx = kparams_ref[bprog, 2]
    cy = kparams_ref[bprog, 3]

    def clip_t(theta):
        cols = [theta[:, 0:1]]
        for i in range(3):
            cols.append(jnp.clip(theta[:, i + 1:i + 2],
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
        def body(t, acc):
            Hacc, gacc, cacc = acc
            xs, ys, zs, lab, val = tile_views(t)
            r0, r1, r2, J0, J1, J2, w, logcost = _tile_terms(
                theta, xs, ys, zs, lab, val, fx, fy, cx, cy, H1, W1)
            Hnew = {
                ij: Hacc[ij] + jnp.sum(
                    w * (J0[ij[0]] * J0[ij[1]] + J1[ij[0]] * J1[ij[1]]
                         + J2[ij[0]] * J2[ij[1]]),
                    axis=-1, keepdims=True)
                for ij in _TRI}
            gnew = [gacc[k] + jnp.sum(
                        w * (J0[k] * r0 + J1[k] * r1 + J2[k] * r2),
                        axis=-1, keepdims=True)
                    for k in range(4)]
            cnew = cacc + jnp.sum(logcost, axis=-1, keepdims=True)
            return Hnew, gnew, cnew
        z = lambda: jnp.zeros((I_BLK, 1))
        init = ({ij: z() for ij in _TRI}, [z() for _ in range(4)], z())
        return jax.lax.fori_loop(0, n_tiles, body, init)

    def total_cost(theta):
        def body(t, acc):
            xs, ys, zs, lab, val = tile_views(t)
            logcost = _tile_terms(theta, xs, ys, zs, lab, val,
                                  fx, fy, cx, cy, H1, W1)[-1]
            return acc + jnp.sum(logcost, axis=-1, keepdims=True)
        return jax.lax.fori_loop(0, n_tiles, body, jnp.zeros((I_BLK, 1)))

    theta = clip_t(theta0_ref[0])
    lam = jnp.full((I_BLK, 1), 1e-3)
    cost = total_cost(theta)

    def lm_iter(_, state):
        theta, lam, cost = state
        Hm, g, _ = accum_normal(theta)
        delta = _chol_solve10(Hm, g, lam)
        theta_new = clip_t(theta - jnp.concatenate(delta, axis=-1))
        new_cost = total_cost(theta_new)
        accept = new_cost < cost
        theta = jnp.where(accept, theta_new, theta)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 3.0), 1e-9, 1e9)
        return theta, lam, cost

    theta, lam, cost = jax.lax.fori_loop(0, max_iter, lm_iter,
                                         (theta, lam, cost))
    theta_out_ref[0] = theta
    cost_out_ref[0, 0, 0] = cost[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("t_lb", "t_ub", "H", "W", "max_iter",
                                    "interpret"))
def lm_solve_pallas(pts, labels, valid, K, theta0, t_lb, t_ub, *,
                    H: int, W: int, max_iter: int = 16,
                    interpret: bool = False):
    """Drop-in replacement for ``lm_solve_fast`` (2D mode).

    Args:
      pts (B, N, 3); labels/valid (B, N); K (B, 3, 3); theta0 (B, I, 4)
      with I a multiple of ``I_BLK``; t_lb/t_ub static python tuples.
    Returns:
      (theta (B, I, 4), cost (B, I)).
    """
    B, N, _ = pts.shape
    I = theta0.shape[1]
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
        H1=float(H - 1), W1=float(W - 1),
        t_lb=tuple(float(v) for v in t_lb),
        t_ub=tuple(float(v) for v in t_ub))

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
            pl.BlockSpec((1, I_BLK, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, I_BLK, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # 4D with trailing dims (1, I_BLK) equal to the full array's
            # (tile-alignment rule holds for any I)
            pl.BlockSpec((1, 1, 1, I_BLK), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, I, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, I // I_BLK, 1, I_BLK), jnp.float32),
        ),
        interpret=interpret,
    )(pts_t, labval, kparams, theta0)
    return theta, cost.reshape(B, I)
