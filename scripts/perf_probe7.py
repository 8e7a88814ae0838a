"""Ablation probe: device-time of pcenc's segment ops INSIDE the fused
forward (standalone sub-op probes sit at the ~3 ms dispatch floor and
measure nothing — see probe6).

Patches one op at a time to a cheap stand-in with identical shapes, then
times the full forward; the delta vs baseline is that op's fused cost.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe7.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.models import KeypointDetector
import deepi2p_tpu.models.pc_encoder as pcenc_mod


def timed(name, model, variables, batch, iters=16):
    def full(v, b, carry):
        coarse, _ = model.apply(v, b["pc"], b["intensity"], b["sn"],
                                b["node_a"], b["node_b"],
                                b["img"] + carry * 0.0, train=False)
        return jnp.sum(coarse).astype(jnp.float32)
    carry0 = jnp.zeros((), jnp.float32)
    exe = jax.jit(full).lower(variables, batch, carry0).compile()
    c = exe(variables, batch, carry0)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = exe(variables, batch, c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s}: {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    cfg = config.oxford(batch_size=8)
    model = KeypointDetector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))(batch)

    base = timed("baseline forward", model, variables, batch)

    real_pool = pcenc_mod.node_pool_max

    def fake_pool(features, idx, num_nodes, *, has_points=None, chunk=256):
        # same shapes/dtypes via a one-hot matmul mean (MXU) instead of the
        # scatter-max lowering
        onehot = jax.nn.one_hot(idx, num_nodes, dtype=features.dtype)
        pooled = jnp.einsum("bnm,bnc->bmc", onehot, features)
        if has_points is None:
            has_points = (jnp.sum(onehot, axis=1) > 0).astype(features.dtype)
        return pooled, has_points

    pcenc_mod.node_pool_max = fake_pool
    try:
        timed("pooling -> one-hot matmul sum", model, variables, batch)
    finally:
        pcenc_mod.node_pool_max = real_pool

    real_scatter = pcenc_mod.scatter_to_points
    pcenc_mod.scatter_to_points = lambda nf, i: jnp.broadcast_to(
        nf[:, :1, :], (nf.shape[0], i.shape[1], nf.shape[2]))
    try:
        timed("scatter_to_points -> broadcast", model, variables, batch)
    finally:
        pcenc_mod.scatter_to_points = real_scatter

    def mm_scatter(nf, i):
        # exact: one-hot row selects a single term; bf16 0/1 weights copy
        # bf16 features bit-exactly, f32 path pins HIGHEST
        onehot = jax.nn.one_hot(i, nf.shape[1], dtype=nf.dtype)
        prec = (jax.lax.Precision.HIGHEST if nf.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        return jnp.einsum("bnm,bmc->bnc", onehot, nf, precision=prec)

    pcenc_mod.scatter_to_points = mm_scatter
    try:
        timed("scatter_to_points -> one-hot matmul", model, variables, batch)
    finally:
        pcenc_mod.scatter_to_points = real_scatter

    real_knn = pcenc_mod.knn
    pcenc_mod.knn = lambda q, d, k: (
        jnp.zeros(q.shape[:2] + (k,), jnp.float32),
        jnp.zeros(q.shape[:2] + (k,), jnp.int32))
    try:
        timed("pcenc knn -> zeros", model, variables, batch)
    finally:
        pcenc_mod.knn = real_knn


if __name__ == "__main__":
    main()
