"""Inverse-distance feature interpolation.

Replicates ``KeypointDetector.upsample_by_interpolation``
(``models/networks_united.py:90-103``).  Note the reference's weights are
``1 - d / sum(d)`` (NOT ``1/d``); with k=3 they sum to 2 — this quirk is kept
deliberately for parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import gather_knn


def interpolate_inverse_dist(query: jax.Array, database: jax.Array,
                             database_features: jax.Array,
                             topk_idx: jax.Array) -> jax.Array:
    """Interpolate database features onto query points.

    Args:
      query: (B, N, 3) target coordinates.
      database: (B, M, 3) source coordinates.
      database_features: (B, M, C) source features.
      topk_idx: (B, N, k) nearest-database indices (precomputed knn).
    Returns:
      (B, N, C) weighted feature sum, weights ``1 - d/sum_k(d)``.
    """
    nb_coord = gather_knn(database, topk_idx)               # (B, N, k, 3)
    # Clamped sqrt: queries can coincide with database points exactly (FPS
    # nodes ARE cloud points, and duplicated nodes occur after resampling),
    # where norm(0) has a NaN gradient and an all-zero neighbourhood makes
    # d/sum(d) = 0/0.  The clamp yields the uniform-weight limit instead.
    sq = jnp.sum(jnp.square(query[:, :, None, :] - nb_coord), axis=-1)
    d = jnp.sqrt(jnp.maximum(sq, 1e-12))                    # (B, N, k)
    w = 1.0 - d / jnp.sum(d, axis=2, keepdims=True)         # (B, N, k)
    nb_feat = gather_knn(database_features, topk_idx)       # (B, N, k, C)
    return jnp.einsum("bnk,bnkc->bnc", w.astype(nb_feat.dtype), nb_feat,
                      preferred_element_type=jnp.float32).astype(nb_feat.dtype)
