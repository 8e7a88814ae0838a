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

The numerical core (:func:`frustum_fast._normal_equations`,
:func:`frustum_fast._residual_cost`, Cholesky ``_spd_solve``) is shared
with the XLA path, so the kernel is bit-compatible with the tested solver.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frustum import _spd_solve
from .frustum_fast import _normal_equations, _residual_cost

I_BLK = 8            # inits per grid program (one sublane tile)
POINT_TILE = 1024    # lane-axis tile for the accumulation loops


def _kernel(pts_ref, labval_ref, kparams_ref, theta0_ref,
            theta_out_ref, cost_out_ref, *, n_tiles: int, max_iter: int,
            H1: float, W1: float, t_lb, t_ub):
    b = pl.program_id(0)
    fx = kparams_ref[b, 0]
    fy = kparams_ref[b, 1]
    cx = kparams_ref[b, 2]
    cy = kparams_ref[b, 3]
    fxb = jnp.full((I_BLK, 1), fx)
    fyb = jnp.full((I_BLK, 1), fy)
    cxb = jnp.full((I_BLK, 1), cx)
    cyb = jnp.full((I_BLK, 1), cy)
    def clip_t(theta):
        # per-component python-scalar clips (array constants can't be
        # captured by a pallas kernel)
        cols = [theta[:, 0:1]]
        for i in range(3):
            cols.append(jnp.clip(theta[:, i + 1:i + 2],
                                 float(t_lb[i]), float(t_ub[i])))
        return jnp.concatenate(cols, axis=-1)

    def tile_views(t):
        sl = pl.ds(t * POINT_TILE, POINT_TILE)
        xs = pts_ref[0, 0, sl][None, :]        # (1, T)
        ys = pts_ref[0, 1, sl][None, :]
        zs = pts_ref[0, 2, sl][None, :]
        lab = labval_ref[0, 0, sl][None, :]
        val = labval_ref[0, 1, sl][None, :]
        return xs, ys, zs, lab, val

    def accum_normal(theta):
        def body(t, acc):
            Hacc, gacc, cacc = acc
            xs, ys, zs, lab, val = tile_views(t)
            Hm, g, c = _normal_equations(theta, xs, ys, zs, lab, val,
                                         fxb, fyb, cxb, cyb, H1, W1)
            return Hacc + Hm, gacc + g, cacc + c
        init = (jnp.zeros((I_BLK, 4, 4)), jnp.zeros((I_BLK, 4)),
                jnp.zeros((I_BLK,)))
        return jax.lax.fori_loop(0, n_tiles, body, init)

    def total_cost(theta):
        def body(t, acc):
            xs, ys, zs, lab, val = tile_views(t)
            return acc + _residual_cost(theta, xs, ys, zs, lab, val,
                                        fxb, fyb, cxb, cyb, H1, W1)
        return jax.lax.fori_loop(0, n_tiles, body, jnp.zeros((I_BLK,)))

    theta = clip_t(theta0_ref[0])
    lam = jnp.full((I_BLK,), 1e-3)
    cost = total_cost(theta)

    def lm_iter(_, state):
        theta, lam, cost = state
        Hm, g, _ = accum_normal(theta)
        # explicit diagonal: jnp.diagonal lowers to an (unsupported) gather
        diag = jnp.stack([Hm[:, i, i] for i in range(4)], axis=-1)
        damp = lam[:, None, None] * jnp.eye(4) * diag[:, None, :] \
            + 1e-9 * jnp.eye(4)
        delta = -_spd_solve(Hm + damp, g)
        theta_new = clip_t(theta + delta)
        new_cost = total_cost(theta_new)
        accept = new_cost < cost
        theta = jnp.where(accept[:, None], theta_new, theta)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam / 3.0, lam * 3.0), 1e-9, 1e9)
        return theta, lam, cost

    theta, lam, cost = jax.lax.fori_loop(0, max_iter, lm_iter,
                                         (theta, lam, cost))
    theta_out_ref[0] = theta
    cost_out_ref[0, 0, 0] = cost


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
            # (1, 1, 1, I_BLK): trailing two dims equal the full array's,
            # satisfying the TPU tile-alignment rule
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
