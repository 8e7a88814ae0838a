"""Monocular depth estimator feeding the ICP pipeline.

TPU-native stand-in for the reference's external monodepth2 stage
(``evaluation/icp/save_depth_map.py:60-102`` imports an out-of-repo
``networks`` package): a small NHWC conv encoder-decoder that maps an
image to a dense depth map, trained on the synthetic renderer's
z-buffered GT depth (``data/synthetic.py::synthetic_batch(with_depth=
True)``).  The predicted map is converted to a camera-frame pseudo point
cloud by ``register.icp.depth_to_pointcloud`` exactly like the reference
converts monodepth output, and the ICP harness scale-calibrates it
against the GT-visible depth mean (``registration_icp.py:216-219``).

Design notes (TPU): stride-2 convolutions down, nearest-resize + conv up
with skip connections; GroupNorm (stateless — no BN running-stat plumbing
for a tiny auxiliary net); log-depth output head so one activation covers
the 0.5..90 m range.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features),
                         dtype=self.dtype)(x)
        return nn.relu(x)


class DepthNet(nn.Module):
    """img (B, H, W, 3) in [0, 255] -> depth (B, H, W) metres."""

    widths: Sequence[int] = (16, 32, 64, 128)
    min_log: float = -0.7    # ~0.5 m
    max_log: float = 4.5     # ~90 m
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        x = img.astype(self.dtype or jnp.float32) / 255.0 - 0.5
        skips = []
        for i, w in enumerate(self.widths):
            x = _ConvBlock(w, stride=1 if i == 0 else 2,
                           dtype=self.dtype, name=f"enc{i}")(x)
            x = _ConvBlock(w, dtype=self.dtype, name=f"enc{i}b")(x)
            skips.append(x)
        for i in reversed(range(len(self.widths) - 1)):
            s = skips[i]
            x = jax.image.resize(x, s.shape[:3] + (x.shape[-1],),
                                 method="nearest")
            x = jnp.concatenate([x, s], axis=-1)
            x = _ConvBlock(self.widths[i], dtype=self.dtype,
                           name=f"dec{i}")(x)
        out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                      name="head")(x)[..., 0]
        log_d = self.min_log + (self.max_log - self.min_log) * \
            nn.sigmoid(out.astype(jnp.float32))
        return jnp.exp(log_d)


def depth_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Masked log-L1: supervise only pixels where a point was splatted
    (gt > 0); scale-robust, matching the harness's later scale
    calibration."""
    mask = (gt > 0).astype(jnp.float32)
    err = jnp.abs(jnp.log(jnp.maximum(pred, 1e-3)) -
                  jnp.log(jnp.maximum(gt, 1e-3)))
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
