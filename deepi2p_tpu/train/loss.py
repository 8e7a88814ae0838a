"""Classification losses.

* Focal loss — numerically mirrors the kornia-derived implementation the
  reference trains with (``models/focal_loss.py:55-112``): softmax + 1e-6 on
  the probabilities, one-hot target *plus 1e-6 on every class*, weight
  ``(1-p)^gamma``, ``alpha=0.5, gamma=2, mean`` reduction
  (``models/multimodal_classifier.py:33``).  Both epsilons are kept for
  numeric parity.

* Fine CE — the reference gathers the inside-frustum points with a dynamic
  sort (``multimodal_classifier.py:160-177``), which needs data-dependent
  shapes; under XLA we compute the same mean with a fixed-shape mask:
  ``sum(mask * ce) / sum(mask)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jax.Array, labels: jax.Array, *, alpha: float = 0.5,
               gamma: float = 2.0, eps: float = 1e-6) -> jax.Array:
    """Mean focal loss.  logits (..., C) float32, labels (...) int."""
    p = jax.nn.softmax(logits, axis=-1) + eps
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype) + eps
    focal = -alpha * ((1.0 - p) ** gamma) * jnp.log(p)
    return jnp.mean(jnp.sum(onehot * focal, axis=-1))


def masked_fine_ce(fine_logits: jax.Array, fine_labels: jax.Array,
                   inside_mask: jax.Array) -> jax.Array:
    """Mean cross-entropy over inside-frustum points only.

    fine_logits (B, N, L) f32; fine_labels (B, N) int in [0, L);
    inside_mask (B, N) {0,1}.
    """
    logp = jax.nn.log_softmax(fine_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, fine_labels[..., None], axis=-1)[..., 0]
    m = inside_mask.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def classification_loss(coarse_logits, fine_logits, labels, *,
                        coarse_loss_alpha: float):
    """Total loss + metrics dict (reference ``multimodal_classifier.py:180-206``).

    ``fine_logits`` may be None (coarse-only model, ``MMClassiferCoarse``).
    """
    coarse = focal_loss(coarse_logits, labels.coarse) * coarse_loss_alpha
    metrics = {}
    if fine_logits is not None:
        fine = masked_fine_ce(fine_logits, labels.fine, labels.coarse)
        loss = coarse + fine
        fine_pred = jnp.argmax(fine_logits, axis=-1)
        m = labels.coarse.astype(jnp.float32)
        fine_acc = (jnp.sum((fine_pred == labels.fine) * m)
                    / jnp.maximum(jnp.sum(m), 1.0))
        metrics.update(fine=fine, fine_accuracy=fine_acc)
    else:
        loss = coarse
    coarse_pred = jnp.argmax(coarse_logits, axis=-1)
    metrics.update(
        loss=loss, coarse=coarse,
        coarse_accuracy=jnp.mean((coarse_pred == labels.coarse)
                                 .astype(jnp.float32)))
    return loss, metrics
