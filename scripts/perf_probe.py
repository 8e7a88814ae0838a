"""Decompose the forward-pass wall: where do the ~55 ms/8 pairs go?

AOT-compiles each stage separately (relay rule: retraces raise), data-chains
iterations, fetches the final carry.  Run on the TPU in the background:

    python scripts/perf_probe.py

Stages:
  * full      — KeypointDetector forward (the bench's stage 1)
  * resnet    — ImageEncoder alone (B=8, 384x640)
  * pcenc     — PCEncoder alone (B=8, N=20480)
  * head      — the per-point MLP alone on a (B, N, 736) input
  * fusion    — full minus (resnet+pcenc+head): attention + interpolation
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.models import KeypointDetector
from deepi2p_tpu.models.img_encoder import ImageEncoder
from deepi2p_tpu.models.pc_encoder import PCEncoder
from deepi2p_tpu.models.layers import PointNetMLP


def timed(name, exe, args, iters=16):
    carry = args[-1]
    out = exe(*args[:-1], carry)
    np.asarray(out)                       # warm sync
    t0 = time.perf_counter()
    c = out
    for _ in range(iters):
        c = exe(*args[:-1], c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:8s}: {dt * 1e3:8.2f} ms/iter")
    return dt


def main():
    cfg = config.oxford(batch_size=8)
    dt = jnp.dtype(cfg.compute_dtype)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=0).items()}
    B, N = cfg.batch_size, cfg.input_pt_num
    L = cfg.num_fine_classes

    # ---- full forward ----------------------------------------------------
    model = KeypointDetector(cfg)
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))(batch)

    def full(v, b, carry):
        coarse, _ = model.apply(v, b["pc"], b["intensity"], b["sn"],
                                b["node_a"], b["node_b"],
                                b["img"] + carry * 0.0, train=False)
        return jnp.sum(coarse).astype(jnp.float32)

    carry0 = jnp.zeros((), jnp.float32)
    full_exe = jax.jit(full).lower(variables, batch, carry0).compile()
    t_full = timed("full", full_exe, (variables, batch, carry0))

    # ---- resnet alone ------------------------------------------------------
    enc = ImageEncoder(dtype=dt)
    vimg = jax.jit(lambda b: enc.init(jax.random.PRNGKey(0),
                                      b["img"].astype(dt), train=False))(batch)

    def resnet(v, b, carry):
        s16, s32, g = enc.apply(v, (b["img"] + carry * 0.0).astype(dt),
                                train=False)
        return (jnp.sum(s16) + jnp.sum(s32) + jnp.sum(g)).astype(jnp.float32)

    resnet_exe = jax.jit(resnet).lower(vimg, batch, carry0).compile()
    t_resnet = timed("resnet", resnet_exe, (vimg, batch, carry0))

    # ---- pc encoder alone --------------------------------------------------
    pce = PCEncoder(Ca=cfg.node_feature_a, Cb=cfg.node_feature_b,
                    Cg=cfg.global_feature,
                    k_interp_point_a=cfg.k_interp_point_a, k_ab=cfg.k_ab,
                    normalization=cfg.normalization,
                    norm_momentum=cfg.norm_momentum,
                    activation=cfg.activation, dtype=dt)
    vpc = jax.jit(lambda b: pce.init(
        jax.random.PRNGKey(0), b["pc"].astype(dt), b["intensity"].astype(dt),
        b["sn"].astype(dt), b["node_a"].astype(dt), b["node_b"].astype(dt),
        False))(batch)

    def pcenc(v, b, carry):
        out = pce.apply(v, (b["pc"] + carry * 0.0).astype(dt),
                        b["intensity"].astype(dt), b["sn"].astype(dt),
                        b["node_a"].astype(dt), b["node_b"].astype(dt), False)
        return (jnp.sum(out.node_b_features)
                + jnp.sum(out.first_pn_out)).astype(jnp.float32)

    pcenc_exe = jax.jit(pcenc).lower(vpc, batch, carry0).compile()
    t_pcenc = timed("pcenc", pcenc_exe, (vpc, batch, carry0))

    # ---- per-point head alone ---------------------------------------------
    head = PointNetMLP([256, 256, 2 + L], normalization=cfg.normalization,
                       norm_momentum=cfg.norm_momentum,
                       activation=cfg.activation, norm_act_at_last=False,
                       dropout_list=[0.5, 0.5, 0.0], dtype=dt)
    hin = jnp.zeros((B, N, 736), dt)
    vh = jax.jit(lambda x: head.init(jax.random.PRNGKey(0), x, False))(hin)

    def head_fn(v, x, carry):
        return jnp.sum(head.apply(v, x + carry.astype(dt), False)
                       ).astype(jnp.float32)

    head_exe = jax.jit(head_fn).lower(vh, hin, carry0).compile()
    t_head = timed("head", head_exe, (vh, hin, carry0))

    rest = t_full - t_resnet - t_pcenc - t_head
    print(f"fusion+interp remainder: {rest * 1e3:8.2f} ms/iter")
    print(f"totals: full={t_full*1e3:.1f} resnet={t_resnet*1e3:.1f} "
          f"pcenc={t_pcenc*1e3:.1f} head={t_head*1e3:.1f}")


if __name__ == "__main__":
    main()
