"""Inverse-distance feature interpolation.

Replicates ``KeypointDetector.upsample_by_interpolation``
(``models/networks_united.py:90-103``).  Note the reference's weights are
``1 - d / sum(d)`` (NOT ``1/d``); with k=3 they sum to 2 — this quirk is kept
deliberately for parity.

TPU formulation: for the node counts of this model (M <= a few hundred) the
k sparse weights are scattered into a dense (B, N, M) weight matrix and the
feature combination becomes ONE batched matmul on the MXU — measured 2.4x
faster on v5e than gathering the (B, N, k, C) neighbour features (the
gather is the bottleneck, ~7.5 ms for C=512 at N=20480).  Callers that
already have the kNN distances pass ``dist2`` to skip the coordinate
gather entirely.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .knn import gather_knn

_DENSE_MAX_M = 1024       # dense-weight path cutoff (memory ~ B*N*M floats)


def _weights(query: jax.Array, database: jax.Array, topk_idx: jax.Array,
             dist2: Optional[jax.Array]) -> jax.Array:
    """(B, N, k) weights ``1 - d/sum_k(d)`` with degenerate-safe sqrt."""
    if dist2 is None:
        nb_coord = gather_knn(database, topk_idx)           # (B, N, k, 3)
        dist2 = jnp.sum(jnp.square(query[:, :, None, :] - nb_coord), axis=-1)
    # Clamped sqrt: queries can coincide with database points exactly (FPS
    # nodes ARE cloud points, and duplicated nodes occur after resampling),
    # where norm(0) has a NaN gradient and an all-zero neighbourhood makes
    # d/sum(d) = 0/0.  The clamp yields the uniform-weight limit instead.
    d = jnp.sqrt(jnp.maximum(dist2.astype(jnp.float32), 1e-12))
    return 1.0 - d / jnp.sum(d, axis=2, keepdims=True)      # (B, N, k)


def interpolate_inverse_dist(query: jax.Array, database: jax.Array,
                             database_features: jax.Array,
                             topk_idx: jax.Array,
                             dist2: Optional[jax.Array] = None) -> jax.Array:
    """Interpolate database features onto query points.

    Args:
      query: (B, N, 3) target coordinates.
      database: (B, M, 3) source coordinates.
      database_features: (B, M, C) source features.
      topk_idx: (B, N, k) nearest-database indices (precomputed knn).
      dist2: optional (B, N, k) squared distances matching ``topk_idx``
        (as returned by :func:`deepi2p_tpu.ops.knn.knn`); skips the
        coordinate gather when provided.
    Returns:
      (B, N, C) weighted feature sum, weights ``1 - d/sum_k(d)``.
    """
    w = _weights(query, database, topk_idx, dist2)
    feat = database_features
    M = feat.shape[1]
    # f32 features pin HIGHEST: on TPU the default precision runs matmuls
    # as bf16 passes, rounding interpolated f32 features at 2^-8 (seen
    # on-chip by test_interpolate_weights); the bf16 model path keeps the
    # fast default (its activations carry bf16 precision anyway).
    prec = (jax.lax.Precision.HIGHEST if feat.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if M <= _DENSE_MAX_M:
        # dense-weight MXU path: scatter the k weights into (B, N, M) and
        # contract in one matmul (duplicate indices sum, which matches the
        # gather formulation exactly: (w1 + w2) f == w1 f + w2 f)
        onehot = (topk_idx[..., None]
                  == jnp.arange(M, dtype=topk_idx.dtype)[None, None, None, :])
        wd = jnp.sum(w[..., None] * onehot, axis=2)         # (B, N, M)
        return jnp.einsum("bnm,bmc->bnc", wd.astype(feat.dtype), feat,
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(feat.dtype)
    nb_feat = gather_knn(feat, topk_idx)                    # (B, N, k, C)
    return jnp.einsum("bnk,bnkc->bnc", w.astype(nb_feat.dtype), nb_feat,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(nb_feat.dtype)
