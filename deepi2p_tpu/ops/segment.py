"""SOM-node pooling ops — the TPU equivalent of the ``index_max`` CUDA
extension (``models/index_max_ext/index_max.cpp:154-159``,
``index_max_cuda.cu:30-62``) and of the masked cluster-mean math inlined in
``models/networks_pc.py:66-82``.

Reference semantics being replicated:

  * ``index_max``: given features ``data[B,C,N]`` and per-point node
    assignment ``index[B,N] in [0,K)``, return for every (channel, node) the
    *index of the point* with the max feature value; the caller then gathers
    with that index so the gradient flows through the gathered (arg-max)
    element only (``models/networks_pc.py:88-104``).  We reproduce exactly
    that: an argmax sweep under ``stop_gradient`` followed by a
    differentiable gather.

  * cluster mean: ``sum(pc * onehot) / stop_grad(count + 1e-5)``
    (``models/networks_pc.py:71-76``).  Implemented as a one-hot matmul so
    the reduction runs on the MXU instead of materialising the (B,3,N,Ma)
    product tensor the reference builds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def node_mean_and_count(points: jax.Array, idx: jax.Array, num_nodes: int):
    """Per-node mean of assigned points plus assignment counts.

    Args:
      points: (B, N, D).
      idx: (B, N) int32 node assignment in [0, num_nodes).
    Returns:
      (mean (B, M, D), count (B, M) float32).  Empty nodes get mean 0.
    The denominator is detached, matching ``models/networks_pc.py:76``.
    """
    onehot = jax.nn.one_hot(idx, num_nodes, dtype=jnp.float32)  # (B, N, M)
    total = jnp.einsum("bnm,bnd->bmd", onehot, points.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    count = jnp.sum(onehot, axis=1)  # (B, M)
    mean = total / jax.lax.stop_gradient(count + 1e-5)[:, :, None]
    return mean, count


@functools.partial(jax.jit, static_argnums=(2, 3))
def _node_argmax(features: jax.Array, idx: jax.Array, num_nodes: int,
                 chunk: int) -> jax.Array:
    """Arg-max point index per (node, channel): (B, M, C) int32.

    Runs under stop_gradient (integer output).  Chunked ``lax.scan`` over the
    point axis keeps the (chunk, M, C) working set VMEM-sized instead of
    materialising (N, M, C).
    """
    B, N, C = features.shape
    pad = (-N) % chunk
    if pad:
        features = jnp.pad(features, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=num_nodes)
    steps = features.shape[1] // chunk
    feats = features.reshape(B, steps, chunk, C).swapaxes(0, 1)
    idxs = idx.reshape(B, steps, chunk).swapaxes(0, 1)

    def body(carry, inp):
        best_val, best_idx = carry
        f, i, off = inp  # f: (B, chunk, C), i: (B, chunk)
        onehot = jax.nn.one_hot(i, num_nodes, dtype=jnp.bool_)  # (B, chunk, M)
        # (B, chunk, M, C) masked values for this chunk only.
        cand = jnp.where(onehot[..., None], f[:, :, None, :], _NEG)
        c_val = jnp.max(cand, axis=1)                    # (B, M, C)
        c_arg = jnp.argmax(cand, axis=1).astype(jnp.int32) + off
        take_new = c_val > best_val
        return (jnp.where(take_new, c_val, best_val),
                jnp.where(take_new, c_arg, best_idx)), None

    offsets = jnp.arange(steps, dtype=jnp.int32) * chunk
    init = (jnp.full((B, num_nodes, C), _NEG, jnp.float32),
            jnp.zeros((B, num_nodes, C), jnp.int32))
    # unroll: scan-trip overhead dominates on some backends
    (_, best_idx), _ = jax.lax.scan(body, init, (feats, idxs, offsets),
                                    unroll=min(4, steps))
    return best_idx


def node_pool_max(features: jax.Array, idx: jax.Array, num_nodes: int,
                  *, chunk: int = 256):
    """Max-pool features into nodes with index_max gradient semantics.

    Args:
      features: (B, N, C); idx: (B, N) int32 node assignment.
    Returns:
      (pooled (B, M, C), has_points (B, M) float32).  ``pooled`` rows of
      empty nodes are zero (the reference multiplies by ``mask_row_max``,
      ``models/networks_pc.py:92``); the gradient flows only through the
      arg-max elements, exactly like the reference's index-then-gather.
    """
    f32 = features.astype(jnp.float32)
    best_idx = _node_argmax(jax.lax.stop_gradient(f32), idx, num_nodes, chunk)
    # Differentiable gather: pooled[b, m, c] = features[b, best_idx[b,m,c], c]
    pooled = jnp.take_along_axis(f32, best_idx, axis=1)
    count = jnp.sum(jax.nn.one_hot(idx, num_nodes, dtype=jnp.float32), axis=1)
    has_points = (count > 0).astype(features.dtype)
    pooled = pooled * has_points[:, :, None]
    return pooled.astype(features.dtype), has_points


def scatter_to_points(node_features: jax.Array, idx: jax.Array) -> jax.Array:
    """Broadcast node features back to points: (B,M,C), (B,N) -> (B,N,C).

    Mirrors the scatter gather at ``models/networks_pc.py:95-97``.
    """
    return jax.vmap(lambda f, i: f[i])(node_features, idx)
