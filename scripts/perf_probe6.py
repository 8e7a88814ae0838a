"""pcenc internals: where do its ~6.8 ms go at Oxford shapes?

Times each sub-op AOT-compiled with data-chained iterations:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe6.py

FINDINGS (round 2d): every standalone sub-op lands at 2-4 ms — i.e. at
the relay's ~3 ms dispatch floor — so this granularity measures nothing
about fused cost (use the ablation probe, perf_probe7.py, instead).
Actionable results: segment_sum node means are 2.2x SLOWER than the
one-hot matmul (4.4 vs 2.0 ms standalone), so the one-hot einsum stays.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.knn import knn
from deepi2p_tpu.ops.segment import (node_mean_and_count, node_pool_max,
                                     scatter_to_points)

B, N, M = 8, 20480, 128


def timed(name, fn, *args, iters=16):
    carry0 = jnp.zeros((), jnp.float32)
    exe = jax.jit(fn).lower(*args, carry0).compile()
    c = exe(*args, carry0)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = exe(*args, c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s}: {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    nodes = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (B, N)).astype(np.int32))
    f32c = jnp.asarray(rng.normal(size=(B, N, 32)).astype(np.float32)).astype(jnp.bfloat16)
    f64c = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32)).astype(jnp.bfloat16)
    node64 = jnp.asarray(rng.normal(size=(B, M, 64)).astype(np.float32)).astype(jnp.bfloat16)

    timed("knn pallas k=3", lambda a, b, c: jnp.sum(
        knn(a + c.astype(a.dtype), b, 3)[0]).astype(jnp.float32), pc, nodes)

    timed("node_mean_and_count (one-hot mm)", lambda p, i, c: jnp.sum(
        node_mean_and_count(p + c.astype(p.dtype), i, M)[0]
    ).astype(jnp.float32), pc, idx)

    def mean_segsum(p, i, c):
        p = p + c.astype(p.dtype)
        seg = (i + jnp.arange(B, dtype=jnp.int32)[:, None] * M).reshape(-1)
        tot = jax.ops.segment_sum(p.reshape(B * N, 3), seg,
                                  num_segments=B * M).reshape(B, M, 3)
        cnt = jax.ops.segment_sum(jnp.ones((B * N,), jnp.float32), seg,
                                  num_segments=B * M).reshape(B, M)
        return jnp.sum(tot / (cnt + 1e-5)[:, :, None]).astype(jnp.float32)
    timed("node mean via segment_sum", mean_segsum, pc, idx)

    for nm, f in (("C=32", f32c), ("C=64", f64c)):
        timed(f"node_pool_max {nm}", lambda x, i, c, f=f: jnp.sum(
            node_pool_max(x + c.astype(x.dtype), i, M)[0]
        ).astype(jnp.float32), f, idx)

    timed("scatter_to_points C=64 (gather)", lambda nf, i, c: jnp.sum(
        scatter_to_points(nf + c.astype(nf.dtype), i)).astype(jnp.float32),
        node64, idx)

    def scatter_mm(nf, i, c):
        nf = nf + c.astype(nf.dtype)
        onehot = jax.nn.one_hot(i, M, dtype=nf.dtype)          # (B, N, M)
        return jnp.sum(jnp.einsum("bnm,bmc->bnc", onehot, nf,
                                  preferred_element_type=jnp.float32)
                       ).astype(jnp.float32)
    timed("scatter_to_points C=64 (one-hot mm)", scatter_mm, node64, idx)

    # knn_fusion convs alone (bf16 MLP stacks at the fusion shapes)
    from deepi2p_tpu.models.pc_encoder import PCEncoder
    pce = PCEncoder(dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.normal(size=(B, M, 64)).astype(np.float32)).astype(jnp.bfloat16)
    var = jax.jit(lambda q, d, f: PCEncoder(dtype=jnp.bfloat16).init(
        {"params": jax.random.PRNGKey(0)},
        method=PCEncoder._knn_fusion, query=q, database=d,
        database_features=f, train=False))
    try:
        v = var(nodes.astype(jnp.bfloat16), nodes.astype(jnp.bfloat16), feats)
        timed("knn_fusion module", lambda q, f, c: jnp.sum(
            pce.apply(v, method=PCEncoder._knn_fusion,
                      query=q + c.astype(q.dtype),
                      database=q, database_features=f,
                      train=False)).astype(jnp.float32),
            nodes.astype(jnp.bfloat16), feats)
    except Exception as e:
        print(f"knn_fusion probe failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
