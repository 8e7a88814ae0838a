"""Ball query: first-K neighbours within a radius, cyclically padded.

TPU equivalent of the ``ball_query`` CUDA extension
(``models/ball_query_ext/ball_query_cuda.cu:23-47``) — dead code in the
reference (built but never imported; SURVEY.md §2.1) but part of its public
op surface, so provided for completeness.

Semantics: for each query row of a distance matrix, return the indices of
the first K database entries with ``dist < radius`` in index order; if
fewer than K qualify, repeat the found ones cyclically; if none qualify,
return zeros.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def ball_query(dist: jax.Array, radius: float, k: int) -> jax.Array:
    """dist (B, M, N) -> indices (B, M, k) int32."""
    B, M, N = dist.shape
    inside = dist < radius                                   # (B, M, N)
    order = jnp.cumsum(inside.astype(jnp.int32), axis=-1) - 1  # rank of hit
    col = jnp.arange(N, dtype=jnp.int32)
    # scatter: slot[rank] = column index, for the first k hits
    take = inside & (order < k)

    def per_row(take_row, order_row):
        slots = jnp.zeros(k, jnp.int32)
        vals = jnp.where(take_row, col, 0)
        tgt = jnp.where(take_row, order_row, k)              # k = dropped
        return slots.at[tgt].max(vals, mode="drop")

    slots = jax.vmap(jax.vmap(per_row))(take, order)         # (B, M, k)
    count = jnp.sum(inside, axis=-1).astype(jnp.int32)       # (B, M)
    # cyclic repetition of the found indices (ball_query_cuda.cu:38-46)
    pos = jnp.arange(k, dtype=jnp.int32)
    safe = jnp.maximum(count, 1)[..., None]
    wrapped = pos[None, None, :] % safe
    out = jnp.take_along_axis(slots, wrapped, axis=-1)
    return jnp.where(count[..., None] > 0, out, 0)
