"""Micro-timings of the fusion/pcenc sub-ops that dominate the forward.

perf_probe.py showed: full 49 ms = resnet 6 + pcenc 14 + head 2 + fusion 27.
This probe times each candidate hot op standalone (AOT-compiled,
data-chained) and a dense-matmul alternative for the interpolation gather.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe2.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.knn import knn, gather_knn, pairwise_dist2
from deepi2p_tpu.ops.segment import node_pool_max, scatter_to_points, \
    node_mean_and_count
from deepi2p_tpu.ops.interpolate import interpolate_inverse_dist

B, N, Ma, Mb = 8, 20480, 128, 128
DT = jnp.bfloat16


def timed(name, fn, *args, iters=24):
    carry0 = jnp.zeros((), jnp.float32)
    exe = jax.jit(fn).lower(*args, carry0).compile()
    c = exe(*args, carry0)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = exe(*args, c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt * 1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)), DT)
    nodes = jnp.asarray(rng.normal(size=(B, Mb, 3)), DT)
    feat512 = jnp.asarray(rng.normal(size=(B, Mb, 512)), DT)
    feat128 = jnp.asarray(rng.normal(size=(B, Ma, 128)), DT)
    f32 = jnp.asarray(rng.normal(size=(B, N, 32)), DT)
    f64 = jnp.asarray(rng.normal(size=(B, N, 64)), DT)
    idx_assign = jnp.asarray(rng.integers(0, Ma, size=(B, N)), jnp.int32)
    _, idx3 = knn(pc, nodes, 3)
    d2_full = pairwise_dist2(pc, nodes)

    timed("pairwise_dist2 (N x M)", lambda a, b, c: jnp.sum(
        pairwise_dist2(a + c.astype(DT), b)).astype(jnp.float32), pc, nodes)
    timed("knn k=3 (dist+topk)", lambda a, b, c: jnp.sum(
        knn(a + c.astype(DT), b, 3)[0]).astype(jnp.float32), pc, nodes)
    timed("knn k=1 (argmin)", lambda a, b, c: jnp.sum(
        jnp.argmin(pairwise_dist2(a + c.astype(DT), b), axis=-1)
        ).astype(jnp.float32), pc, nodes)
    timed("gather_knn 512ch k=3", lambda f, i, c: jnp.sum(
        gather_knn(f + c.astype(DT), i)).astype(jnp.float32), feat512, idx3)
    timed("interpolate 512ch (current)", lambda q, db, f, i, c: jnp.sum(
        interpolate_inverse_dist(q + c.astype(DT), db, f, i)
        ).astype(jnp.float32), pc, nodes, feat512, idx3)

    # dense-weight matmul alternative: weights scattered to (B, N, M),
    # then one MXU matmul (B,N,M)x(B,M,C)
    def interp_dense(q, db, f, d2, i, c):
        f = f + c.astype(DT)
        d2k = jnp.take_along_axis(d2, i, axis=-1)           # (B, N, k)
        d = jnp.sqrt(jnp.maximum(d2k, 1e-12))
        w = 1.0 - d / jnp.sum(d, axis=-1, keepdims=True)    # (B, N, k)
        onehot = (i[..., None] == jnp.arange(Mb)[None, None, None, :])
        wd = jnp.sum(w[..., None] * onehot, axis=2).astype(DT)  # (B, N, M)
        return jnp.sum(jnp.einsum("bnm,bmc->bnc", wd, f,
                                  preferred_element_type=jnp.float32)
                       ).astype(jnp.float32)
    timed("interpolate 512ch (dense mm)", interp_dense, pc, nodes, feat512,
          d2_full, idx3)

    timed("node_pool_max C=32", lambda f, i, c: jnp.sum(
        node_pool_max(f + c.astype(DT), i, Ma)[0]).astype(jnp.float32),
        f32, idx_assign)
    timed("node_pool_max C=64", lambda f, i, c: jnp.sum(
        node_pool_max(f + c.astype(DT), i, Ma)[0]).astype(jnp.float32),
        f64, idx_assign)
    timed("scatter_to_points 128ch", lambda f, i, c: jnp.sum(
        scatter_to_points(f + c.astype(DT), i)).astype(jnp.float32),
        feat128, idx_assign)
    timed("node_mean_and_count", lambda p, i, c: jnp.sum(
        node_mean_and_count(p + c.astype(DT), i, Ma)[0]).astype(jnp.float32),
        pc, idx_assign)

    # scatter via one-hot matmul alternative
    def scatter_mm(f, i, c):
        f = f + c.astype(DT)
        onehot = jax.nn.one_hot(i, Ma, dtype=DT)            # (B, N, M)
        return jnp.sum(jnp.einsum("bnm,bmc->bnc", onehot, f,
                                  preferred_element_type=jnp.float32)
                       ).astype(jnp.float32)
    timed("scatter via onehot-mm 128ch", scatter_mm, feat128, idx_assign)


if __name__ == "__main__":
    main()
