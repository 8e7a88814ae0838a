"""PointNet building blocks (flax.linen), channel-last.

The reference's ``EquivariantLayer`` / ``MyConv2d`` / ``PointNet`` /
``PointNetConv2d`` (``models/layers_pc.py:259-456``) are all kernel-size-1
convolutions over a points axis — on TPU these are plain ``nn.Dense`` over a
trailing channel axis, which XLA maps straight onto the MXU.  One module,
:class:`PointNetMLP`, covers every reference variant: it works on any input
shape ``(..., C)`` (points ``(B, N, C)`` or neighbourhoods ``(B, M, K, C)``).

Parity notes:
  * weight init: He normal, ``std = sqrt(2 / fan_in)``
    (``models/layers_pc.py:70-88,304-322``).
  * normalization in {batch, instance}; activation in
    {relu, elu, swish, leakyrelu(0.01), selu} (``models/layers_pc.py:281-295``).
  * BatchNorm momentum: torch ``m`` (new stat weight) == flax ``1 - m``.
  * ``norm_act_at_last`` / per-layer ``dropout_list``
    (``models/layers_pc.py:345-398``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

HE_NORMAL = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def make_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    return {
        "relu": nn.relu,
        "elu": nn.elu,
        "swish": nn.silu,          # x * sigmoid(x) == Swish (layers_pc.py:10-23)
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "selu": nn.selu,
    }[name]


class NormLayer(nn.Module):
    """Batch / instance normalization over all-but-channel axes."""
    kind: str = "batch"            # 'batch' | 'instance' | 'none'
    momentum: float = 0.1          # torch convention
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.momentum,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.kind == "instance":
            # InstanceNorm(affine=True): per-sample, per-channel over the
            # points axis — GroupNorm with one channel per group.
            return nn.GroupNorm(num_groups=None, group_size=1,
                                epsilon=1e-5, dtype=self.dtype)(x)
        return x


class PointNetMLP(nn.Module):
    """A stack of [Dense -> Norm -> Act -> Dropout] shared-point layers.

    Equivalent to the reference ``PointNet`` (``models/layers_pc.py:345-408``)
    and, on 4-D inputs, to ``PointNetConv2d`` / the ``MyConv2d`` stacks.
    """
    features: Sequence[int]
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    norm_act_at_last: bool = False
    dropout_list: Optional[Sequence[float]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = make_activation(self.activation)
        n = len(self.features)
        drops = self.dropout_list or [0.0] * n
        for i, c in enumerate(self.features):
            x = nn.Dense(c, kernel_init=HE_NORMAL,
                         bias_init=nn.initializers.zeros,
                         dtype=self.dtype, name=f"dense_{i}")(x)
            last = i == n - 1
            if (not last) or self.norm_act_at_last:
                x = NormLayer(self.normalization, self.norm_momentum,
                              dtype=self.dtype, name=f"norm_{i}")(x, train)
                x = act(x)
            if drops[i] and 0.0 < drops[i] < 1.0:
                x = nn.Dropout(rate=drops[i], deterministic=not train)(x)
        return x
