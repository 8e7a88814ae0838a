"""Round-2f forward decomposition by ablation (probe7 method: patch one
component to a shape-preserving stand-in, time the FULL fused forward; the
delta vs baseline is that component's fused cost — standalone probes sit at
the dispatch floor and measure nothing).

Stand-ins keep a real (tiny) data dependency on their inputs so XLA cannot
dead-code-eliminate the upstream graph.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe9.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.models import KeypointDetector
from deepi2p_tpu.models.layers import PointNetMLP
from deepi2p_tpu.models.img_encoder import ImageEncoder
import deepi2p_tpu.models.pc_encoder as pcenc_mod


def timed(name, model, variables, batch, iters=16):
    def full(v, b, carry):
        coarse, _ = model.apply(v, b["pc"], b["intensity"], b["sn"],
                                b["node_a"], b["node_b"],
                                b["img"] + carry * 0.0, train=False)
        return jnp.sum(coarse).astype(jnp.float32)
    carry0 = jnp.zeros((), jnp.float32)
    exe = jax.jit(full).lower(variables, batch, carry0).compile()
    c = exe(variables, batch, carry0)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = exe(variables, batch, c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s}: {dt * 1e3:8.3f} ms", flush=True)
    return dt


def cheap_mlp_stand_in(names):
    """Patch PointNetMLP.__call__ to a broadcast stand-in for `names`."""
    real = PointNetMLP.__call__

    def patched(self, x, train=False):
        if self.name in names:
            c = self.features[-1]
            # tiny real dependency, no matmul
            dep = x[..., :1] * jnp.asarray(1e-6, x.dtype)
            return jnp.broadcast_to(dep, x.shape[:-1] + (c,))
        return real(self, x, train)
    return real, patched


def main():
    import os
    cfg = config.oxford(batch_size=int(os.environ.get("PROBE_B", "8")))
    model = KeypointDetector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))(batch)

    base = timed("baseline forward", model, variables, batch)

    # --- ResNet trunk --------------------------------------------------
    real_img = ImageEncoder.__call__

    def fake_img(self, img, train=False):
        B, H, W, _ = img.shape
        dt = img.dtype
        dep = jnp.mean(img) * jnp.asarray(1e-6, dt)
        s16 = jnp.broadcast_to(img[:, ::16, ::16, :1] + dep,
                               (B, H // 16, W // 16, 256))
        s32 = jnp.broadcast_to(img[:, ::32, ::32, :1] + dep,
                               (B, H // 32, W // 32, 512))
        g = jnp.broadcast_to(img[:, 0, 0, :1] + dep, (B, 512))
        return s16, s32, g

    ImageEncoder.__call__ = fake_img
    try:
        timed("ResNet trunk -> broadcast", model, variables, batch)
    finally:
        ImageEncoder.__call__ = real_img

    # --- MLP stacks, one group at a time -------------------------------
    for label, names in [
        ("head (per_point_pn)", {"per_point_pn"}),
        ("pcenc point PNs (first/second/final)",
         {"first_pointnet", "second_pointnet", "final_pointnet"}),
        ("pcenc knn fusion MLPs", {"knn_before", "knn_after"}),
        ("detector node PNs + attention",
         {"node_b_attention_pn", "node_b_pn", "node_a_attention_pn",
          "node_a_pn"}),
    ]:
        real, patched = cheap_mlp_stand_in(names)
        PointNetMLP.__call__ = patched
        try:
            timed(f"{label} -> broadcast", model, variables, batch)
        finally:
            PointNetMLP.__call__ = real

    # --- segment-max pools ---------------------------------------------
    real_pool = pcenc_mod.node_pool_max

    def fake_pool(features, idx, num_nodes, *, has_points=None, chunk=256):
        B, N, C = features.shape
        dep = features[:, :1, :] * jnp.asarray(1e-6, features.dtype)
        pooled = jnp.broadcast_to(dep, (B, num_nodes, C))
        if has_points is None:
            has_points = jnp.ones((B, num_nodes), features.dtype)
        return pooled, has_points

    pcenc_mod.node_pool_max = fake_pool
    try:
        timed("segment-max pools -> broadcast", model, variables, batch)
    finally:
        pcenc_mod.node_pool_max = real_pool

    # --- kNN (both pallas kNN calls in pcenc) ---------------------------
    real_knn = pcenc_mod.knn
    pcenc_mod.knn = lambda q, d, k: (
        jnp.zeros(q.shape[:2] + (k,), jnp.float32) + q[:, :, :1] * 1e-6,
        jnp.zeros(q.shape[:2] + (k,), jnp.int32))
    try:
        timed("pcenc knn -> zeros", model, variables, batch)
    finally:
        pcenc_mod.knn = real_knn


if __name__ == "__main__":
    main()
