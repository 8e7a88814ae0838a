"""SO-Net-style point-cloud encoder.

TPU-native re-design of ``PCEncoder`` (``models/networks_pc.py:15-124``):

  * point->node_a assignment: one batched MXU distance matmul + ``top_k``
    (vs the reference's (B,3,N,Ma) difference tensor, ``networks_pc.py:61-64``);
  * cluster means: one-hot matmul (``networks_pc.py:66-82``);
  * node max-pool: :func:`deepi2p_tpu.ops.node_pool_max` — argmax under
    ``stop_gradient`` + differentiable gather, the exact gradient semantics
    of the ``index_max`` CUDA op + ``torch.gather``
    (``networks_pc.py:88-104``);
  * ``GeneralKNNFusionModule`` (``models/layers_pc.py:756-818``) is inlined
    as the ``knn_fusion`` stage: kNN over nodes, decentred neighbour coords,
    two shared-MLP stacks with a max-pool fusion in between.

Channel plan (KeypointDetector defaults Ca=64, Cb=256, Cg=512,
``models/networks_united.py:19``): first PN 7->[32,32,32]; second PN
64->[64,64]; knn fusion (3+64)->[256,256] | [512,256]; final PN
(3+256)->[256,512].
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.knn import knn, gather_knn
from ..ops.segment import node_pool_max, node_mean_and_count, scatter_to_points
from .layers import PointNetMLP


class PCEncoderOut(NamedTuple):
    pc_centers: jax.Array        # (B, N, 3)
    cluster_mean: jax.Array      # (B, Ma, 3)
    min_k_idx: jax.Array         # (B, N, k_interp_point_a)
    first_pn_out: jax.Array      # (B, N, Ca/2)
    second_pn_out: jax.Array     # (B, N, Ca)
    node_a_features: jax.Array   # (B, Ma, Ca)
    node_b_features: jax.Array   # (B, Mb, Cb)
    global_feature: jax.Array    # (B, Cg)
    min_k_d2: jax.Array          # (B, N, k) squared dists matching min_k_idx


class PCEncoder(nn.Module):
    Ca: int = 64
    Cb: int = 256
    Cg: int = 512
    k_interp_point_a: int = 3
    k_ab: int = 16
    normalization: str = "batch"
    norm_momentum: float = 0.1
    activation: str = "relu"
    dtype: Optional[jnp.dtype] = None

    def _mlp(self, feats, name, norm_act_at_last=True):
        return PointNetMLP(feats, normalization=self.normalization,
                           norm_momentum=self.norm_momentum,
                           activation=self.activation,
                           norm_act_at_last=norm_act_at_last,
                           dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, pc, intensity, sn, node_a, node_b, train: bool = False):
        """pc (B,N,3), intensity (B,N,1), sn (B,N,3), node_a (B,Ma,3),
        node_b (B,Mb,3) -> :class:`PCEncoderOut`."""
        B, N, _ = pc.shape
        Ma = node_a.shape[1]
        half = self.Ca // 2

        # -- point -> node_a assignment & de-centering ---------------------
        min_k_d2, min_k_idx = knn(pc, node_a, self.k_interp_point_a)  # (B,N,k)
        min_idx = min_k_idx[:, :, 0]                            # (B, N)
        cluster_mean, count = node_mean_and_count(pc, min_idx, Ma)
        has_points = (count > 0).astype(pc.dtype)               # (B, Ma)
        pc_centers = scatter_to_points(cluster_mean, min_idx)   # (B, N, 3)
        pc_decentered = jax.lax.stop_gradient(pc - pc_centers)

        # -- first & second PointNet with node max-pool fusion --------------
        x = jnp.concatenate([pc_decentered, intensity, sn], axis=-1)  # (B,N,7)
        first_pn_out = self._mlp([half] * 3, "first_pointnet")(x, train)
        pooled1, _ = node_pool_max(first_pn_out, min_idx, Ma,
                                   has_points=has_points)
        fused = jnp.concatenate(
            [first_pn_out, scatter_to_points(pooled1, min_idx)], axis=-1)
        second_pn_out = self._mlp([self.Ca] * 2, "second_pointnet")(fused, train)
        node_a_features, _ = node_pool_max(second_pn_out, min_idx, Ma,
                                           has_points=has_points)

        # -- kNN fusion onto node_b (GeneralKNNFusionModule) ----------------
        node_b_features = self._knn_fusion(node_b, cluster_mean,
                                           node_a_features, train)

        # -- global feature --------------------------------------------------
        final_in = jnp.concatenate([node_b, node_b_features], axis=-1)
        final = self._mlp([self.Cg // 2, self.Cg], "final_pointnet")(final_in, train)
        global_feature = jnp.max(final, axis=1)                  # (B, Cg)

        return PCEncoderOut(pc_centers, cluster_mean, min_k_idx,
                            first_pn_out, second_pn_out,
                            node_a_features, node_b_features, global_feature,
                            min_k_d2=min_k_d2)

    def _knn_fusion(self, query, database, database_features, train):
        """query (B,M,3), database (B,Md,3), features (B,Md,C) -> (B,M,Cb)."""
        _, idx = knn(jax.lax.stop_gradient(query),
                     jax.lax.stop_gradient(database), self.k_ab)  # (B, M, K)
        nb_coord = gather_knn(database, idx)                      # (B,M,K,3)
        nb_feat = gather_knn(database_features, idx)              # (B,M,K,C)
        decentered = jax.lax.stop_gradient(nb_coord - query[:, :, None, :])
        y = jnp.concatenate([decentered, nb_feat], axis=-1)       # (B,M,K,3+C)
        y = self._mlp([self.Cb, self.Cb], "knn_before")(y, train)
        pooled = jnp.max(y, axis=2, keepdims=True)                # (B,M,1,Cb)
        y = jnp.concatenate([jnp.broadcast_to(pooled, y.shape), y], axis=-1)
        y = self._mlp([self.Cb * 2, self.Cb], "knn_after")(y, train)
        return jnp.max(y, axis=2)                                 # (B,M,Cb)
