"""Camera projection and coarse/fine label generation, fully on-device.

Replicates the GT-label math embedded in the reference train step
(``models/multimodal_classifier.py:136-177``): project ``P @ pc`` through
``K``; a point is *inside* iff ``0 <= px <= W-1``, ``0 <= py <= H-1`` and
``z > 0.1``; the fine label is the index of the (H/32, W/32) grid cell
``floor(px/32) + floor(py/32) * W_fine``.

The reference's dynamic sort-based "insider gather"
(``multimodal_classifier.py:160-177``) relies on data-dependent shapes and
does not map to XLA; the loss side (see :mod:`deepi2p_tpu.train.loss`)
instead uses a fixed-shape mask, which is numerically identical for the
mean-reduced cross entropy.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def project_points(pc: jax.Array, P: jax.Array, K: jax.Array):
    """Project points into pixel coordinates.

    Args:
      pc: (B, N, 3) points in the point-cloud frame.
      P: (B, 3, 4) or (B, 4, 4) pose (pc frame -> camera frame).
      K: (B, 3, 3) intrinsics.
    Returns:
      (pxpy (B, N, 2), z (B, N)) — pixel coordinates and camera-frame depth.
    """
    R = P[:, :3, :3]
    t = P[:, :3, 3]
    # precision=HIGHEST: label generation must be exact f32 — TPU matmuls
    # otherwise run bf16 passes, perturbing pixel coords ~0.4% and flipping
    # boundary labels (the reference's torch matmul is true f32); the D=3
    # contraction makes the extra passes free.
    cam = jnp.einsum("bij,bnj->bni", R, pc,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    hom = jnp.einsum("bij,bnj->bni", K, cam,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    z = hom[:, :, 2]
    pxpy = hom[:, :, :2] / z[:, :, None]
    return pxpy, z


def coarse_labels(pxpy: jax.Array, z: jax.Array, H: int, W: int) -> jax.Array:
    """Binary inside-frustum labels (B, N) int32.

    Inside test per ``multimodal_classifier.py:143-148``.
    """
    x_in = (pxpy[:, :, 0] >= 0) & (pxpy[:, :, 0] <= W - 1)
    y_in = (pxpy[:, :, 1] >= 0) & (pxpy[:, :, 1] <= H - 1)
    z_in = z > 0.1
    return (x_in & y_in & z_in).astype(jnp.int32)


def fine_labels(pxpy: jax.Array, scale: int, W_fine: int) -> jax.Array:
    """Fine grid-cell labels (B, N) int32 (valid only where inside).

    ``floor(px/scale) + floor(py/scale) * W_fine``
    (``multimodal_classifier.py:152-153``).
    """
    cell = jnp.floor(pxpy / scale).astype(jnp.int32)
    return cell[:, :, 0] + cell[:, :, 1] * W_fine


class Labels(NamedTuple):
    coarse: jax.Array   # (B, N) int32 in {0, 1}
    fine: jax.Array     # (B, N) int32, meaningful only where coarse == 1
    pxpy: jax.Array     # (B, N, 2) float32 pixel coordinates
    z: jax.Array        # (B, N) float32 camera-frame depth
    fine_violations: jax.Array   # () int32: insiders with out-of-range fine


def generate_labels(pc: jax.Array, P: jax.Array, K: jax.Array,
                    H: int, W: int, fine_scale: int) -> Labels:
    """Full label generation for one batch (train-step hot path)."""
    pxpy, z = project_points(pc, P, K)
    coarse = coarse_labels(pxpy, z, H, W)
    W_fine = int(round(W / fine_scale))
    fine = fine_labels(pxpy, fine_scale, W_fine)
    # The reference ASSERTS every insider's fine label is in range
    # (``multimodal_classifier.py:169-172``); asserts don't exist under
    # XLA, so the violation count is surfaced as a metric instead — a
    # projection-math bug shows up as fine_violations > 0 rather than
    # being silently clipped away.
    L = W_fine * int(round(H / fine_scale))
    violations = jnp.sum(coarse * ((fine < 0) | (fine >= L)).astype(jnp.int32))
    # Clamp fine labels where outside so downstream one-hot stays in range.
    fine = jnp.clip(fine, 0, L - 1)
    return Labels(coarse=coarse, fine=fine, pxpy=pxpy, z=z,
                  fine_violations=violations)
