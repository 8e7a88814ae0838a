"""Round 2 of micro-probes: top-k alternatives + segment-max alternatives.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe3.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.knn import pairwise_dist2, knn
from deepi2p_tpu.ops.segment import node_pool_max

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
    print(f"{name:32s}: {dt * 1e3:8.3f} ms")
    return dt


def knn_iterative(q, db, k):
    """k-NN via k masked argmin passes (cheap for tiny k vs full sort)."""
    d2 = pairwise_dist2(q, db)
    idxs, dists = [], []
    big = jnp.asarray(jnp.inf, d2.dtype)
    for _ in range(k):
        i = jnp.argmin(d2, axis=-1)                       # (B, N)
        d = jnp.min(d2, axis=-1)
        idxs.append(i)
        dists.append(d)
        d2 = d2 + (jax.nn.one_hot(i, d2.shape[-1], dtype=d2.dtype) * big)
    return jnp.stack(dists, -1), jnp.stack(idxs, -1).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)), DT)
    nodes = jnp.asarray(rng.normal(size=(B, Mb, 3)), DT)
    f32 = jnp.asarray(rng.normal(size=(B, N, 32)), DT)
    f64 = jnp.asarray(rng.normal(size=(B, N, 64)), DT)
    idx_assign = jnp.asarray(rng.integers(0, Ma, size=(B, N)), jnp.int32)

    timed("knn k=3 top_k (baseline)", lambda a, b, c: jnp.sum(
        knn(a + c.astype(DT), b, 3)[0]).astype(jnp.float32), pc, nodes)
    timed("knn k=3 iterative argmin", lambda a, b, c: jnp.sum(
        knn_iterative(a + c.astype(DT), b, 3)[0]).astype(jnp.float32),
        pc, nodes)

    for chunk in (256, 1024, 4096):
        timed(f"node_pool_max C=64 chunk={chunk}",
              lambda f, i, c, ch=chunk: jnp.sum(
                  node_pool_max(f + c.astype(DT), i, Ma, chunk=ch)[0]
                  ).astype(jnp.float32), f64, idx_assign)

    # segment-max via jax.ops.segment_max (scatter lowering)
    def seg_max(f, i, c):
        f = (f + c.astype(DT)).astype(jnp.float32)
        Bn, Nn, C = f.shape
        seg = (i + jnp.arange(Bn, dtype=i.dtype)[:, None] * Ma).reshape(-1)
        out = jax.ops.segment_max(f.reshape(-1, C), seg,
                                  num_segments=Bn * Ma)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)
                       ).astype(jnp.float32)
    timed("segment_max scatter C=64", seg_max, f64, idx_assign)

    # direct max-with-gradient (no argmax bookkeeping): single masked sweep
    def direct_max(f, i, c):
        f = (f + c.astype(DT)).astype(jnp.float32)
        onehot = jax.nn.one_hot(i, Ma, dtype=jnp.bool_)    # (B, N, M)
        cand = jnp.where(onehot[..., None], f[:, :, None, :], -1e30)
        return jnp.sum(jnp.max(cand, axis=1)).astype(jnp.float32)
    timed("direct masked max C=64 (1shot)", direct_max, f64, idx_assign)

    # bf16 sweep variant
    def direct_max_bf16(f, i, c):
        f = f + c.astype(DT)
        onehot = jax.nn.one_hot(i, Ma, dtype=jnp.bool_)
        cand = jnp.where(onehot[..., None], f[:, :, None, :],
                         jnp.asarray(-1e30, DT))
        return jnp.sum(jnp.max(cand, axis=1).astype(jnp.float32)
                       ).astype(jnp.float32)
    timed("direct masked max C=64 bf16", direct_max_bf16, f64, idx_assign)


if __name__ == "__main__":
    main()
