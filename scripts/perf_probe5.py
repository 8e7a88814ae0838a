"""Solve-stage decomposition at the exact bench config.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe5.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.register.frustum import solve_frustum_batch, initial_guess
from deepi2p_tpu.register.frustum_pallas import lm_solve_pallas, I_BLK


def timed(name, exe, args, iters=16):
    c = exe(*args)
    jax.block_until_ready(c)
    np.asarray(jax.tree.leaves(c)[0])
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(exe(*args))
    np.asarray(jax.tree.leaves(outs[-1])[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    cfg = config.oxford(batch_size=8)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=0).items()}
    pc = batch["pc"]
    K = batch["K"]
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.integers(0, 2, pc.shape[:2]), jnp.int32)

    def full_solve(pc, pred, K):
        return solve_frustum_batch(pc, pred, K, H=cfg.img_H, W=cfg.img_W,
                                   rng=jax.random.PRNGKey(0), n_inits=64,
                                   max_iter=24, solver_stride=1)
    exe = jax.jit(full_solve).lower(pc, pred, K).compile()
    timed("solve 64 inits iter=24 stride1", exe, (pc, pred, K))

    for it in (12, 24):
        for stride in (1, 2):
            def f(pc, pred, K, it=it, s=stride):
                return solve_frustum_batch(pc, pred, K, H=cfg.img_H,
                                           W=cfg.img_W,
                                           rng=jax.random.PRNGKey(0),
                                           n_inits=64, max_iter=it,
                                           solver_stride=s)
            e = jax.jit(f).lower(pc, pred, K).compile()
            timed(f"solve iter={it} stride={stride}", e, (pc, pred, K))

    # kernel alone (no initial_guess / argmin postlude)
    labels = pred.astype(jnp.float32)
    ang, valid = jax.vmap(initial_guess)(pc, pred)
    theta0 = jnp.zeros((8, 64, 4), jnp.float32)

    def kernel_only(pc, labels, valid, K, theta0):
        return lm_solve_pallas(pc, labels, valid, K, theta0,
                               (-5.0, -0.1, -10.0), (5.0, 0.1, 10.0),
                               H=cfg.img_H, W=cfg.img_W, max_iter=24)
    e = jax.jit(kernel_only).lower(pc, labels, valid, K, theta0).compile()
    timed("pallas kernel alone iter=24", e, (pc, labels, valid, K, theta0))


if __name__ == "__main__":
    main()
