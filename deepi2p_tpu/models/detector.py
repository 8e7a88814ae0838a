"""Attention-fusion frustum classifier — the flagship model.

TPU-native re-design of ``KeypointDetector``
(``models/networks_united.py:14-210``): a point tower (:class:`PCEncoder`)
and an image tower (:class:`ImageEncoder`) fused by per-node attention over
the ResNet s16/s32 feature maps, an interpolation pyramid back to points,
and a per-point head emitting 2 coarse (inside/outside frustum) +
``H/32 * W/32`` fine grid-cell logits.

All attention contractions are einsums that lower to MXU matmuls; the
interpolation gathers reuse the kNN indices of the encoder where the
reference does (``networks_united.py:188-191`` reuses ``node_a_min_k_idx``).

Channel plan (cited to the reference):
  * node_b attention PN: 256+512 -> [256, L]           (networks_united.py:25-30)
  * node_b PN:        256+512+512+512 -> [1024,512,512] (:33-38)
  * node_a attention PN: 64+512 -> [256, 4L]            (:40-45)
  * node_a PN:        64+256+512 -> [512,128,128]       (:48-53)
  * per-point PN:     32+64+128+512=736 -> [256,256,2+L],
    dropout [0.5,0.5,0] when fine, else [128,128,2]     (:57-74)
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.knn import knn
from ..ops.interpolate import interpolate_inverse_dist
from .layers import PointNetMLP
from .pc_encoder import PCEncoder
from .img_encoder import ImageEncoder


class KeypointDetector(nn.Module):
    cfg: Config

    def _mlp(self, feats, name, dropout_list=None):
        cfg = self.cfg
        cls = PointNetMLP
        if cfg.remat:
            # trade recompute for activation memory (jax.checkpoint);
            # the per-point MLPs dominate activation footprint at N=20480
            cls = nn.remat(PointNetMLP, static_argnums=(2,))
        return cls(feats, normalization=cfg.normalization,
                           norm_momentum=cfg.norm_momentum,
                           activation=cfg.activation,
                           norm_act_at_last=False,
                           dropout_list=dropout_list,
                           dtype=self._dtype(), name=name)

    def _dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    @nn.compact
    def __call__(self, pc, intensity, sn, node_a, node_b, img,
                 train: bool = False):
        """Forward pass.

        Args:
          pc (B,N,3), intensity (B,N,1), sn (B,N,3): point cloud inputs.
          node_a (B,Ma,3), node_b (B,Mb,3): SOM/FPS nodes.
          img: (B, H, W, 3).
        Returns:
          (coarse_logits (B,N,2), fine_logits (B,N,L)) — or coarse only if
          ``cfg.is_fine_resolution`` is False (``networks_united.py:204-210``).
        """
        cfg = self.cfg
        dt = self._dtype()
        B, N, _ = pc.shape
        Ma, Mb = node_a.shape[1], node_b.shape[1]
        L = cfg.num_fine_classes

        enc = PCEncoder(Ca=cfg.node_feature_a, Cb=cfg.node_feature_b,
                        Cg=cfg.global_feature,
                        k_interp_point_a=cfg.k_interp_point_a, k_ab=cfg.k_ab,
                        normalization=cfg.normalization,
                        norm_momentum=cfg.norm_momentum,
                        activation=cfg.activation, dtype=dt,
                        name="pc_encoder")(
            pc.astype(dt), intensity.astype(dt), sn.astype(dt),
            node_a.astype(dt), node_b.astype(dt), train)

        s16, s32, img_global = ImageEncoder(dtype=dt, name="img_encoder")(
            img.astype(dt), train)
        s16 = s16.reshape(B, -1, s16.shape[-1])      # (B, 4L, 256)
        s32 = s32.reshape(B, -1, s32.shape[-1])      # (B, L, 512)

        glob_b = jnp.broadcast_to(img_global[:, None, :], (B, Mb, img_global.shape[-1]))
        glob_a = jnp.broadcast_to(img_global[:, None, :], (B, Ma, img_global.shape[-1]))
        pc_glob = jnp.broadcast_to(enc.global_feature[:, None, :],
                                   (B, Mb, enc.global_feature.shape[-1]))

        # ---- node_b attention over the s32 map (networks_united.py:147-155)
        nb_att = self._mlp([256, L], "node_b_attention_pn")(
            jnp.concatenate([enc.node_b_features, glob_b], axis=-1), train)
        nb_img = jnp.einsum("bml,blc->bmc", nb_att, s32,
                            preferred_element_type=jnp.float32).astype(dt) / L
        up_node_b = self._mlp([1024, 512, 512], "node_b_pn")(
            jnp.concatenate([enc.node_b_features, pc_glob, nb_img, glob_b],
                            axis=-1), train)

        # ---- interpolate node_b -> pc (networks_united.py:157-165)
        pb_d2, pb_idx = knn(pc, node_b, cfg.k_interp_point_b)
        interp_pb = interpolate_inverse_dist(pc.astype(dt), node_b.astype(dt),
                                             up_node_b, pb_idx, dist2=pb_d2)

        # ---- node_a attention over the s16 map (networks_united.py:170-174)
        na_att = self._mlp([256, 4 * L], "node_a_attention_pn")(
            jnp.concatenate([enc.node_a_features, glob_a], axis=-1), train)
        na_img = jnp.einsum("bml,blc->bmc", na_att, s16,
                            preferred_element_type=jnp.float32).astype(dt) / (4 * L)

        # ---- interpolate node_b -> node_a (networks_united.py:176-182)
        ab_d2, ab_idx = knn(node_a, node_b, cfg.k_interp_ab)
        interp_ab = interpolate_inverse_dist(node_a.astype(dt),
                                             node_b.astype(dt),
                                             up_node_b, ab_idx, dist2=ab_d2)
        up_node_a = self._mlp([512, 128, 128], "node_a_pn")(
            jnp.concatenate([enc.node_a_features, interp_ab, na_img], axis=-1),
            train)

        # ---- interpolate node_a -> pc, reusing the encoder kNN (:188-191)
        interp_pa = interpolate_inverse_dist(pc.astype(dt), node_a.astype(dt),
                                             up_node_a, enc.min_k_idx,
                                             dist2=enc.min_k_d2)

        # ---- per-point head (:194-208)
        head_in = jnp.concatenate(
            [interp_pa, interp_pb, enc.first_pn_out, enc.second_pn_out],
            axis=-1)
        if cfg.is_fine_resolution:
            scores = self._mlp([256, 256, 2 + L], "per_point_pn",
                               dropout_list=[0.5, 0.5, 0.0])(head_in, train)
            scores = scores.astype(jnp.float32)
            return scores[:, :, :2], scores[:, :, 2:]
        scores = self._mlp([128, 128, 2], "per_point_pn",
                           dropout_list=[0.5, 0.5, 0.0])(head_in, train)
        return scores.astype(jnp.float32)
