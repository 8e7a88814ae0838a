"""ResNet feature-pyramid backbone (flax.linen, NHWC).

TPU-native re-implementation of the reference's vendored torchvision ResNet
(``models/resnet.py:118-216``).  The only behavioural difference from stock
torchvision — returning the 6-level feature pyramid
``[conv1(/2), layer1(/4), layer2(/8), layer3(/16), layer4(/32), avgpool]``
(``models/resnet.py:195-216``) — is preserved.

NHWC layout keeps the channel axis on TPU lanes; convolutions lower to MXU
``conv_general_dilated``.  ImageNet weights can be imported from a local
torchvision ``.pth`` via :func:`load_torch_resnet_params` (zero-egress
environments cannot download them; the reference downloads at runtime,
``models/resnet.py:219-225``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=KAIMING_OUT,
                    dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    kernel_init=KAIMING_OUT, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=KAIMING_OUT,
                               dtype=self.dtype, name="down_conv")(x)
            identity = norm("down_bn")(identity)
        return nn.relu(y + identity)


class ResNetPyramid(nn.Module):
    """ResNet backbone returning the 6-level pyramid of the reference."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)       # resnet34
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        out = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=KAIMING_OUT, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        out.append(x)                                              # /2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, filters) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(filters, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            out.append(x)                                          # /4 .. /32
        out.append(jnp.mean(x, axis=(1, 2)))                       # (B, 512)
        return out


def resnet34_pyramid(dtype=None) -> ResNetPyramid:
    return ResNetPyramid(stage_sizes=(3, 4, 6, 3), dtype=dtype)


# --------------------------------------------------------------------------
# torchvision weight import (for ImageNet-pretrained parity)
# --------------------------------------------------------------------------

def load_torch_resnet_params(state_dict, stage_sizes=(3, 4, 6, 3)):
    """Convert a torchvision resnet34 ``state_dict`` to flax param/stat trees.

    Accepts either torch tensors or numpy arrays as values.  Returns
    ``(params, batch_stats)`` pytrees matching :class:`ResNetPyramid`.
    The classifier head (``fc.*``) is ignored, as the reference only uses the
    convolutional trunk (``models/networks_img.py:26-28``).
    """
    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    sd = {k: to_np(v) for k, v in state_dict.items()}
    params, stats = {}, {}

    def conv(dst, src):
        params[dst] = {"kernel": sd[src + ".weight"].transpose(2, 3, 1, 0)}

    def bn(dst, src):
        params[dst] = {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}
        stats[dst] = {"mean": sd[src + ".running_mean"],
                      "var": sd[src + ".running_var"]}

    conv("conv1", "conv1")
    bn("bn1", "bn1")
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            dst = f"layer{stage + 1}_{b}"
            src = f"layer{stage + 1}.{b}"
            block_p, block_s = {}, {}
            for cname in ("conv1", "conv2"):
                block_p[cname] = {
                    "kernel": sd[f"{src}.{cname}.weight"].transpose(2, 3, 1, 0)}
            for bname in ("bn1", "bn2"):
                block_p[bname] = {"scale": sd[f"{src}.{bname}.weight"],
                                  "bias": sd[f"{src}.{bname}.bias"]}
                block_s[bname] = {"mean": sd[f"{src}.{bname}.running_mean"],
                                  "var": sd[f"{src}.{bname}.running_var"]}
            if f"{src}.downsample.0.weight" in sd:
                block_p["down_conv"] = {
                    "kernel": sd[f"{src}.downsample.0.weight"].transpose(2, 3, 1, 0)}
                block_p["down_bn"] = {"scale": sd[f"{src}.downsample.1.weight"],
                                      "bias": sd[f"{src}.downsample.1.bias"]}
                block_s["down_bn"] = {"mean": sd[f"{src}.downsample.1.running_mean"],
                                      "var": sd[f"{src}.downsample.1.running_var"]}
            params[dst] = block_p
            if block_s:
                stats[dst] = block_s
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return as_jnp(params), as_jnp(stats)
