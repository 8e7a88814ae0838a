"""Auxiliary losses — parity with ``models/losses.py`` (all unused by the
classification training path in the reference; kept for API completeness,
SURVEY.md §2.2 'keypoint-era leftovers').

All functions take channel-last arrays: point clouds (B, N, D), heatmaps
(B, H, W, 1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.knn import pairwise_dist2


def gaussian_kernel_2d(kernel_size: int, sigma: float) -> jax.Array:
    """Normalised separable gaussian (``models/losses.py:36-51``)."""
    x = jnp.arange(kernel_size, dtype=jnp.float32)
    mean = (kernel_size - 1) / 2.0
    g = jnp.exp(-((x - mean) / sigma) ** 2 / 2.0)
    k = jnp.outer(g, g)
    return k / jnp.sum(k)


def gaussian_smooth(img: jax.Array, kernel_size: int, sigma: float
                    ) -> jax.Array:
    """Depthwise gaussian blur of (B, H, W, C) with reflect padding."""
    k = gaussian_kernel_2d(kernel_size, sigma)
    C = img.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))     # HWIO, depthwise
    pad = kernel_size // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def heatmap_loss(heatmap: jax.Array, keypoints_pxpy: jax.Array,
                 nms_size: int) -> Tuple[jax.Array, jax.Array]:
    """L1 between a predicted heatmap and a gaussian-splatted keypoint map
    (``models/losses.py:82-118``).

    heatmap (B, H, W, 1); keypoints_pxpy (B, M, 2).
    """
    B, H, W, _ = heatmap.shape
    idx = jnp.round(keypoints_pxpy).astype(jnp.int32)
    flat = jnp.clip(idx[..., 1] * W + idx[..., 0], 0, H * W - 1)   # (B, M)
    target = jax.vmap(
        lambda f: jnp.zeros(H * W).at[f].max(1.0))(flat)
    target = target.reshape(B, H, W, 1)
    target = gaussian_smooth(target, nms_size, nms_size / 6.0)
    return jnp.mean(jnp.abs(heatmap - target)), target


def chamfer_loss(src: jax.Array, dst: jax.Array):
    """Symmetric chamfer over (B, M, D) / (B, N, D)
    (``models/losses.py:122-149``)."""
    d = jnp.sqrt(jnp.maximum(pairwise_dist2(src, dst), 1e-12))  # (B, M, N)
    forward = jnp.mean(jnp.min(d, axis=2))
    backward = jnp.mean(jnp.min(d, axis=1))
    total = forward + backward
    return total, total, total


def chamfer_loss_prob(src: jax.Array, dst: jax.Array,
                      sigma_src: Optional[jax.Array] = None,
                      sigma_dst: Optional[jax.Array] = None):
    """Uncertainty-weighted chamfer (``models/losses.py:152-202``):
    ``log(sigma) + dist/sigma`` with the nearest neighbour's sigma."""
    if sigma_src is None or sigma_dst is None:
        return chamfer_loss(src, dst)
    d = jnp.sqrt(jnp.maximum(pairwise_dist2(src, dst), 1e-12))
    fwd_min = jnp.min(d, axis=2)
    fwd_idx = jnp.argmin(d, axis=2)
    sig_fd = jnp.take_along_axis(sigma_dst, fwd_idx, axis=1)
    forward = jnp.mean(jnp.log(sig_fd) + fwd_min / sig_fd)
    bwd_min = jnp.min(d, axis=1)
    bwd_idx = jnp.argmin(d, axis=1)
    sig_bd = jnp.take_along_axis(sigma_src, bwd_idx, axis=1)
    backward = jnp.mean(jnp.log(sig_bd) + bwd_min / sig_bd)
    pure = jax.lax.stop_gradient(jnp.mean(fwd_min) + jnp.mean(bwd_min))
    w_fd = (1.0 / sig_fd) / jnp.mean(1.0 / sig_fd)
    w_bd = (1.0 / sig_bd) / jnp.mean(1.0 / sig_bd)
    weighted = jax.lax.stop_gradient(
        jnp.mean(w_fd * fwd_min) + jnp.mean(w_bd * bwd_min))
    return forward + backward, pure, weighted


def keypoint_on_pc_loss(keypoints: jax.Array, pc: jax.Array) -> jax.Array:
    """Mean distance of each keypoint to its nearest cloud point
    (``models/losses.py:205-223``)."""
    d = jnp.sqrt(jnp.maximum(pairwise_dist2(keypoints, pc), 1e-12))
    return jnp.mean(jnp.min(d, axis=2))


def img_keypoint_offset_norm_loss(offsets: jax.Array, box_dx: float,
                                  box_dy: float) -> jax.Array:
    """Penalise keypoint offsets outside the box
    (``models/losses.py:226-233``).  offsets (B, M, 2)."""
    a = jnp.abs(offsets)
    mask = ((a[..., 0] > box_dx) | (a[..., 1] > box_dy)).astype(jnp.float32)
    return jnp.mean(mask * jnp.linalg.norm(offsets, axis=-1))
