"""k-nearest-neighbour primitives, MXU-formulated.

Replaces the reference's brute-force pairwise-difference + ``torch.topk``
pattern (``models/networks_pc.py:61-64``, ``models/layers_pc.py:798-799``,
``util/som.py:5-42``) and the gather helpers of ``models/operations.py:31-47``.

The pairwise distance is computed as ``|x|^2 + |y|^2 - 2 x.y`` so the
dominant term is a single batched matmul that XLA tiles onto the MXU,
instead of materialising the (B, N, M, 3) difference tensor the reference
builds.  ``lax.top_k`` runs on the (small) node axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_dist2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix.

    Args:
      x: (B, N, D) query points.
      y: (B, M, D) database points.
    Returns:
      (B, N, M) squared distances (clamped at 0 for numerical safety).
    """
    # MXU path: the cross term is a batched matmul.  Accumulate in f32.
    # precision=HIGHEST: on TPU, f32 matmuls otherwise run as bf16 passes —
    # measured on-chip, that flipped 3.6% (k=3) / 6.1% (k=16) of neighbour
    # indices vs exact f32 (the fused Pallas kernel and the reference's
    # difference-tensor formulation are both exact).  The contraction is
    # D=3, so the extra passes are free next to the (B, N, M) output.
    xy = jnp.einsum("bnd,bmd->bnm", x, y,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    x2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)[:, :, None]
    y2 = jnp.sum(y.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def knn(query: jax.Array, database: jax.Array, k: int, *,
        exact: bool = True):
    """Indices & distances of the ``k`` nearest database points per query.

    Mirrors ``torch.topk(dist, k, largest=False, sorted=True)`` in the
    reference (``models/networks_pc.py:61-64``).

    ``exact=False`` switches to ``lax.approx_min_k`` (TPU PartialReduce,
    measured 1.6x faster than the full top_k at k=3, M=128) — an opt-in
    speed lever: recall is ~0.95, which perturbs interpolation weights
    slightly, so the default stays exact for reference parity.

    On TPU the exact path auto-dispatches to the fused Pallas kernel
    (:mod:`deepi2p_tpu.ops.knn_pallas`) when the database fits VMEM —
    same results, no HBM (B, N, M) materialisation, direct (db - q)^2
    distances (the reference's own formulation).

    Gradient contract: ``dist2`` is only guaranteed differentiable w.r.t.
    the inputs on the XLA path; the Pallas kernel stop-gradients it, so on
    single-device TPU the returned distances must be treated as data.  All
    in-repo call sites consume coordinates (no tangents), but a future
    param-dependent query must not rely on gradients through ``knn``.

    Args:
      query: (B, N, D); database: (B, M, D).
    Returns:
      (dist2, idx): both (B, N, k); idx int32 into the M axis, sorted by
      increasing distance.
    """
    if exact:
        from .knn_pallas import knn_pallas, pallas_eligible
        if pallas_eligible(query, database, k):
            return knn_pallas(query, database, k)
    d2 = pairwise_dist2(query, database)
    if not exact:
        return jax.lax.approx_min_k(d2, k)
    neg, idx = jax.lax.top_k(-d2, k)  # top_k sorts descending => nearest first
    return -neg, idx


def gather_knn(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-query neighbour features.

    Equivalent to ``knn_gather_by_indexing`` (``models/operations.py:31-47``)
    in channel-last layout.

    Args:
      features: (B, M, C) database features.
      idx: (B, N, k) int indices into M.
    Returns:
      (B, N, k, C).
    """
    return jax.vmap(lambda f, i: f[i])(features, idx)
