"""SOM node-assignment query — exact API of ``util/som.py:5-42``.

``query_topk(node, x, M, k)`` computes, for every point, its k nearest SOM
nodes, and returns the same triple as the reference (in channel-last
layout): the one-hot assignment mask for the k-fold expanded points, the
per-node "has any point" indicator, and the flattened nearest-node indices.
The in-model equivalent is inlined in :class:`deepi2p_tpu.models.PCEncoder`
(as in the reference, ``models/networks_pc.py:61-76``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import knn


def query_topk(node: jax.Array, x: jax.Array, M: int, k: int):
    """Args:
      node: (B, M, 3) SOM nodes; x: (B, N, 3) points.
    Returns:
      mask (B, kN, M) one-hot of the assigned node per expanded point,
      mask_row_max (B, M) 1 where a node has any point among its k-NN hits,
      min_idx (B, kN) the flattened k-nearest node indices
      (column-major like the reference: first all rank-0 indices, then
      rank-1, ...; ``util/som.py:24-30``).
    """
    _, idx = knn(x, node, k)                  # (B, N, k), sorted
    # reference stacks rank-by-rank: min_idx = cat([idx[:, :, i] for i])
    min_idx = jnp.concatenate([idx[:, :, i] for i in range(k)], axis=1)
    mask = jax.nn.one_hot(min_idx, M, dtype=jnp.float32)      # (B, kN, M)
    mask_row_max = (jnp.sum(mask, axis=1) > 0).astype(jnp.float32)
    return mask, mask_row_max, min_idx
