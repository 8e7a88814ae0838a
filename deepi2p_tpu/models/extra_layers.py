"""Auxiliary layer library — parity with the reference's full layer zoo.

The flagship model only uses the blocks in :mod:`layers` / the encoders, but
the reference ships a wider library that downstream users may depend on;
this module provides TPU-native (channel-last flax) equivalents:

  * :class:`EMAU` — Expectation-Maximization Attention Unit
    (``models/layers_common.py:11-89``; unused by the reference networks);
  * :class:`PointResNet` — PointNet with a skip connection
    (``models/layers_pc.py:459-510``);
  * :class:`PointNetFusion` — PointNet with global-maxpool feature fusion
    (``models/layers_pc.py:513-587``); covers the Conv2d variant too (apply
    to (B, M, K, C) and pool ``axis=-2``);
  * :class:`UpConv` — upsample + conv block (``models/layers_pc.py:193-256``);
  * :class:`KNNModule` — self-kNN aggregation over node coordinates
    (``models/layers_pc.py:687-753``; the query/database variant used by the
    flagship encoder is ``PCEncoder._knn_fusion``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.knn import knn, gather_knn
from .layers import PointNetMLP, NormLayer, make_activation, HE_NORMAL


class EMAU(nn.Module):
    """Expectation-Maximization attention over a point axis.

    Input/output (B, N, C); returns (out, mu (B, K, C)).  The EM iterations
    run under ``stop_gradient`` like the reference's ``torch.no_grad`` block
    (``layers_common.py:56-63``).
    """
    channels: int
    bases: int
    stage_num: int = 1
    is_normalized: bool = False
    dtype: Optional[jnp.dtype] = None

    def _l2norm(self, x, axis):
        if self.is_normalized:
            return x / (1e-6 + jnp.linalg.norm(x, axis=axis, keepdims=True))
        return x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        B, N, C = x.shape
        mu0 = self.param(
            "mu", lambda key: self._l2norm(
                jax.random.normal(key, (1, self.bases, C))
                * jnp.sqrt(2.0 / self.bases), axis=2))
        idn = x
        x = nn.Dense(C, kernel_init=HE_NORMAL, name="conv1")(x)

        mu = jnp.broadcast_to(mu0, (B, self.bases, C))
        xs = jax.lax.stop_gradient(x)
        z = None
        for _ in range(self.stage_num):
            z = jax.nn.softmax(
                jnp.einsum("bnc,bkc->bnk", xs, mu), axis=2)   # (B, N, K)
            z_norm = z / (1e-6 + jnp.sum(z, axis=1, keepdims=True))
            mu = self._l2norm(
                jnp.einsum("bnk,bnc->bkc", z_norm, xs), axis=2)
        x = nn.relu(jnp.einsum("bnk,bkc->bnc", z, mu))
        x = nn.Dense(C, use_bias=False, kernel_init=HE_NORMAL,
                     name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="conv2_bn")(x)
        return x + idn, mu


class PointResNet(nn.Module):
    """PointNet stack whose last layer consumes cat(first_out, last_hidden)
    (``models/layers_pc.py:492-510``)."""
    features: Sequence[int]
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def layer(i, c):
            return PointNetMLP([c], normalization=self.normalization,
                               norm_momentum=self.norm_momentum,
                               activation=self.activation,
                               norm_act_at_last=True, dtype=self.dtype,
                               name=f"layer_{i}")
        feats = list(self.features)
        out0 = layer(0, feats[0])(x, train)
        h = out0
        for i, c in enumerate(feats[1:-1], start=1):
            h = layer(i, c)(h, train)
        return layer(len(feats) - 1, feats[-1])(
            jnp.concatenate([out0, h], axis=-1), train)


class PointNetFusion(nn.Module):
    """Two PointNets fused by a broadcast global max-pool
    (``models/layers_pc.py:513-587``).  ``pool_axis=-2`` covers the Conv2d
    variant operating on (B, M, K, C) neighbourhoods."""
    features_before: Sequence[int]
    features_after: Sequence[int]
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    act_norm_at_end_of_pn1: bool = True
    pool_axis: int = -2
    final_pool: bool = False      # Conv2d variant returns the pooled max
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = PointNetMLP(self.features_before,
                        normalization=self.normalization,
                        norm_momentum=self.norm_momentum,
                        activation=self.activation,
                        norm_act_at_last=self.act_norm_at_end_of_pn1,
                        dtype=self.dtype, name="before")(x, train)
        pooled = jnp.max(x, axis=self.pool_axis, keepdims=True)
        y = jnp.concatenate([x, jnp.broadcast_to(pooled, x.shape)], axis=-1)
        y = PointNetMLP(self.features_after,
                        normalization=self.normalization,
                        norm_momentum=self.norm_momentum,
                        activation=self.activation,
                        norm_act_at_last=False, dtype=self.dtype,
                        name="after")(y, train)
        if self.final_pool:
            return jnp.max(y, axis=self.pool_axis)
        return y


class UpConv(nn.Module):
    """Bilinear upsample + 3x3 conv (``models/layers_pc.py:193-256``)."""
    features: int
    scale: int = 2
    normalization: Optional[str] = None
    activation: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * self.scale, W * self.scale, C),
                             method="bilinear")
        x = nn.Conv(self.features, (3, 3), padding=1, kernel_init=HE_NORMAL,
                    dtype=self.dtype, name="conv")(x)
        if self.normalization:
            x = NormLayer(self.normalization, dtype=self.dtype,
                          name="norm")(x, train)
        if self.activation:
            x = make_activation(self.activation)(x)
        return x


class KNNModule(nn.Module):
    """Self-kNN neighbourhood aggregation over coordinates
    (``models/layers_pc.py:687-753``): per node, decentre its K nearest
    nodes, shared MLP, max-pool."""
    features: Sequence[int]
    k: int
    center_type: str = "center"     # 'center' | 'avg'
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, coords: jax.Array, features: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """coords (B, M, 3), features (B, M, C) -> (centers, out (B, M, C'))."""
        _, idx = knn(jax.lax.stop_gradient(coords),
                     jax.lax.stop_gradient(coords), self.k)
        nb = gather_knn(coords, idx)                        # (B, M, K, 3)
        if self.center_type == "avg":
            center = jnp.mean(nb, axis=2, keepdims=True)
        else:
            center = coords[:, :, None, :]
        decentered = jax.lax.stop_gradient(nb - center)
        nb_feat = gather_knn(features, idx)                 # (B, M, K, C)
        y = jnp.concatenate([decentered, nb_feat], axis=-1)
        y = PointNetMLP(self.features, normalization=self.normalization,
                        norm_momentum=self.norm_momentum,
                        activation=self.activation, norm_act_at_last=True,
                        dtype=self.dtype, name="mlp")(y, train)
        return jax.lax.stop_gradient(center[:, :, 0, :]), jnp.max(y, axis=2)


class ConvModule(nn.Module):
    """Conv + norm + activation block with configurable order.

    Parity with the mini-vendored mmcv ``ConvModule``
    (``models/mmcv/conv_module.py:44-164``) — imported but never
    instantiated by the reference networks; provided for API completeness.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    normalization: Optional[str] = "batch"
    activation: Optional[str] = "relu"
    order: Tuple[str, str, str] = ("conv", "norm", "act")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ops = {
            "conv": lambda y: nn.Conv(
                self.features, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding=self.padding,
                use_bias=self.use_bias, kernel_init=HE_NORMAL,
                dtype=self.dtype, name="conv")(y),
            "norm": lambda y: NormLayer(self.normalization or "none",
                                        dtype=self.dtype,
                                        name="norm")(y, train),
            "act": lambda y: (make_activation(self.activation)(y)
                              if self.activation else y),
        }
        for step in self.order:
            x = ops[step](x)
        return x


class WSConv(nn.Conv):
    """Weight-standardised conv (mmcv ``ConvWS2d``, ``models/mmcv/conv_ws.py``):
    kernel is mean/std-normalised over its input dims before the conv."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def standardize(kernel):
            axes = tuple(range(kernel.ndim - 1))   # HWI (all but out channel)
            mu = jnp.mean(kernel, axis=axes, keepdims=True)
            std = jnp.std(kernel, axis=axes, keepdims=True)
            return (kernel - mu) / (std + self.eps)
        # re-implement via a param + functional conv to standardise lazily
        in_feats = x.shape[-1]
        kshape = tuple(self.kernel_size) + (in_feats, self.features)
        kernel = self.param("kernel", HE_NORMAL, kshape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        y = jax.lax.conv_general_dilated(
            x, standardize(kernel),
            window_strides=tuple(self.strides) if isinstance(self.strides, (tuple, list)) else (self.strides,) * len(self.kernel_size),
            padding=[(self.padding, self.padding)] * len(self.kernel_size)
            if isinstance(self.padding, int) else self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias if bias is not None else y


class Scale(nn.Module):
    """Learnable scalar multiplier (mmcv ``Scale``, ``models/mmcv/scale.py``)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.param("scale",
                       lambda key: jnp.asarray(self.init_value, jnp.float32))
        return x * s


class KNNFusionModule(nn.Module):
    """KNNModule with a two-stage max-pool feature fusion
    (``models/layers_pc.py:821-896``): the pooled neighbourhood feature is
    broadcast back and concatenated before a second shared-MLP stack."""
    features_before: Sequence[int]
    features_after: Sequence[int]
    k: int
    center_type: str = "center"
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, coords: jax.Array, features: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        _, idx = knn(jax.lax.stop_gradient(coords),
                     jax.lax.stop_gradient(coords), self.k)
        nb = gather_knn(coords, idx)
        if self.center_type == "avg":
            center = jnp.mean(nb, axis=2, keepdims=True)
        else:
            center = coords[:, :, None, :]
        decentered = jax.lax.stop_gradient(nb - center)
        nb_feat = gather_knn(features, idx)
        y = jnp.concatenate([decentered, nb_feat], axis=-1)
        y = PointNetMLP(self.features_before,
                        normalization=self.normalization,
                        norm_momentum=self.norm_momentum,
                        activation=self.activation, norm_act_at_last=True,
                        dtype=self.dtype, name="before")(y, train)
        pooled = jnp.max(y, axis=2, keepdims=True)
        y = jnp.concatenate([jnp.broadcast_to(pooled, y.shape), y], axis=-1)
        y = PointNetMLP(self.features_after,
                        normalization=self.normalization,
                        norm_momentum=self.norm_momentum,
                        activation=self.activation, norm_act_at_last=True,
                        dtype=self.dtype, name="after")(y, train)
        return (jax.lax.stop_gradient(center[:, :, 0, :]),
                jnp.max(y, axis=2))
