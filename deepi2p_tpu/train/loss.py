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
               gamma: float = 2.0, eps: float = 1e-6,
               class_weight: jax.Array | None = None) -> jax.Array:
    """Mean focal loss.  logits (..., C) float32, labels (...) int.

    ``class_weight`` (C,) optionally re-weights examples by their TRUE
    class (a per-class alpha).  The reference trains with the symmetric
    ``alpha=0.5`` only; the weight is a deepi2p_tpu extension used to
    push inside-frustum recall (round-3 e2e analysis: false negatives
    actively repel the frustum solver, so the operating point the solver
    wants is recall-heavy, not accuracy-optimal).
    """
    p = jax.nn.softmax(logits, axis=-1) + eps
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype) + eps
    focal = -alpha * ((1.0 - p) ** gamma) * jnp.log(p)
    per_ex = jnp.sum(onehot * focal, axis=-1)
    if class_weight is not None:
        w = jnp.asarray(class_weight, dtype=per_ex.dtype)[labels]
        per_ex = per_ex * w
    return jnp.mean(per_ex)


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
                        coarse_loss_alpha: float,
                        inside_weight: float = 1.0):
    """Total loss + metrics dict (reference ``multimodal_classifier.py:180-206``).

    ``fine_logits`` may be None (coarse-only model, ``MMClassiferCoarse``).
    ``inside_weight`` > 1 up-weights the inside-frustum coarse class (see
    :func:`focal_loss`); 1.0 reproduces the reference loss exactly.
    """
    cw = (None if inside_weight == 1.0
          else jnp.array([1.0, float(inside_weight)]))
    coarse = focal_loss(coarse_logits, labels.coarse,
                        class_weight=cw) * coarse_loss_alpha
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
    # inside-class precision/recall: what the frustum solver actually
    # consumes (round-3: 0.83 accuracy hid 0.41 inside recall; FN-heavy
    # errors poison the solve far more than accuracy suggests).
    tp = jnp.sum(((coarse_pred == 1) & (labels.coarse == 1))
                 .astype(jnp.float32))
    pp = jnp.sum((coarse_pred == 1).astype(jnp.float32))
    ap = jnp.sum((labels.coarse == 1).astype(jnp.float32))
    metrics.update(
        loss=loss, coarse=coarse,
        coarse_accuracy=jnp.mean((coarse_pred == labels.coarse)
                                 .astype(jnp.float32)),
        inside_precision=tp / jnp.maximum(pp, 1.0),
        inside_recall=tp / jnp.maximum(ap, 1.0))
    return loss, metrics
