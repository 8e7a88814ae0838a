"""Probe round 3: batch scaling, int8 conv MXU rate, approx_min_k.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe4.py
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.models import KeypointDetector
from deepi2p_tpu.ops.knn import pairwise_dist2


def timed(name, fn, *args, iters=12):
    carry0 = jnp.zeros((), jnp.float32)
    exe = jax.jit(fn).lower(*args, carry0).compile()
    c = exe(*args, carry0)
    np.asarray(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = exe(*args, c)
    np.asarray(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s}: {dt * 1e3:8.3f} ms", flush=True)
    return dt


def forward_time(B):
    cfg = config.oxford(batch_size=B)
    model = KeypointDetector(cfg)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    variables = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))(batch)

    def full(v, b, carry):
        coarse, _ = model.apply(v, b["pc"], b["intensity"], b["sn"],
                                b["node_a"], b["node_b"],
                                b["img"] + carry * 0.0, train=False)
        return jnp.sum(coarse).astype(jnp.float32)

    t = timed(f"full forward B={B}", full, variables, batch)
    print(f"   -> {B / t:.1f} pairs/s forward-only", flush=True)


def int8_conv_probe():
    """Can the relay run int8 convs on the MXU, and how fast?"""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 127, (8, 96, 160, 128)), jnp.int8)
    k = jnp.asarray(rng.integers(-127, 127, (3, 3, 128, 128)), jnp.int8)
    xb = x.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)

    def conv_i8(x, k, carry):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (jnp.sum(y.astype(jnp.float32)) + carry).astype(jnp.float32)

    def conv_bf16(x, k, carry):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (jnp.sum(y) + carry).astype(jnp.float32)

    flops = 2 * 8 * 96 * 160 * 3 * 3 * 128 * 128
    try:
        t = timed("conv 3x3 128ch int8", conv_i8, x, k)
        print(f"   -> {flops / t / 1e12:.2f} TOP/s int8", flush=True)
    except Exception as e:
        print(f"int8 conv FAILED: {type(e).__name__}: {e}", flush=True)
    t = timed("conv 3x3 128ch bf16", conv_bf16, xb, kb)
    print(f"   -> {flops / t / 1e12:.2f} TFLOP/s bf16", flush=True)


def approx_min_k_probe():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(8, 20480, 3)), jnp.bfloat16)
    nodes = jnp.asarray(rng.normal(size=(8, 128, 3)), jnp.bfloat16)

    def topk(a, b, carry):
        d2 = pairwise_dist2(a + carry.astype(a.dtype), b)
        neg, idx = jax.lax.top_k(-d2, 3)
        return jnp.sum(-neg).astype(jnp.float32)

    def approx(a, b, carry):
        d2 = pairwise_dist2(a + carry.astype(a.dtype), b)
        val, idx = jax.lax.approx_min_k(d2, 3)
        return jnp.sum(val).astype(jnp.float32)

    timed("knn k=3 via top_k", topk, pc, nodes)
    try:
        timed("knn k=3 via approx_min_k", approx, pc, nodes)
    except Exception as e:
        print(f"approx_min_k FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    for B in (8, 16, 32):
        forward_time(B)
    int8_conv_probe()
    approx_min_k_probe()
