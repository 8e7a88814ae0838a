"""Image tower.

Mirrors ``ImageEncoder`` (``models/networks_img.py:12-28``): a ResNet-34
trunk whose pyramid levels 3/4/5 are consumed — the stride-16 map (256 ch),
the stride-32 map (512 ch) and the global average-pooled vector (512 ch).
The reference's unused pixel meshgrid (``networks_img.py:20-24``) is not
reproduced.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNetPyramid


class ImageEncoder(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False):
        """img: (B, H, W, 3) -> (s16 (B,H/16,W/16,256), s32 (B,H/32,W/32,512),
        global (B,512))."""
        pyramid = ResNetPyramid(dtype=self.dtype, name="backbone")(img, train)
        return pyramid[3], pyramid[4], pyramid[5]
