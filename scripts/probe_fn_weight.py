"""Does down-weighting outside-labelled blocks rescue FN-heavy solves?

Round-3 e2e analysis (BENCH_NOTES.md): a trained classifier's errors are
recall-limited (inside recall ~0.4), and each false negative contributes
a residual that actively REPELS the frustum from the point — so solves
fail even on samples with precision ~0.95.  The ``outside_weight`` knob
(register/frustum.py::_block_cost) down-weights outside blocks in the
robust cost.  This probe sweeps miss_rate x outside_weight on street-
structured clouds (the e2e geometry) to decide whether the knob belongs
in the e2e chain and at what recall it starts winning.

CPU-safe:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_fn_weight.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.data.synthetic import _street_cloud
from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np
from deepi2p_tpu.register.noise import drop_insiders, error_rate
from deepi2p_tpu.ops.projection import project_points, coarse_labels

H, W = 96, 160
N, B = 4096, 8
N_INITS, MAX_ITER = 32, 32
f = 0.6 * W
K_np = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)


def make(rng, miss, fp):
    pc, _, _ = _street_cloud(rng, N)
    yaw = rng.uniform(-np.pi, np.pi)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    P[:3, 3] = [rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)]
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    lab = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    cor = drop_insiders(rng, lab, miss_rate=miss, fp_rate=fp)
    return pc, P, lab, cor


def run_cell(miss, fp, w, seed=0):
    rng = np.random.default_rng(seed)
    probs = [make(rng, miss, fp) for _ in range(B)]
    pc = jnp.asarray(np.stack([p[0] for p in probs]))
    P_gt = np.stack([p[1] for p in probs])
    cor = jnp.asarray(np.stack([p[3] for p in probs]).astype(np.int32))
    err = np.mean([error_rate(p[2], p[3]) for p in probs])
    rec = np.mean([(p[2] & p[3]).sum() / max(p[2].sum(), 1) for p in probs])
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
    t0 = time.time()
    P_pred, _ = solve_frustum_batch(
        pc, cor, K, H=H, W=W, rng=jax.random.PRNGKey(seed),
        n_inits=N_INITS, max_iter=MAX_ITER, backend="generic",
        outside_weight=w)
    P_pred = np.asarray(P_pred)
    diffs = [pose_diff_np(P_pred[i], P_gt[i]) for i in range(B)]
    rte = np.array([d[0] for d in diffs])
    rre = np.array([d[1] for d in diffs])
    succ = np.mean((rte < 2.0) & (rre < 5.0))
    print(f"miss={miss:.2f} fp={fp:.2f} w={w:<5} -> err={err:.3f} "
          f"rec={rec:.2f} success={succ:.2f} "
          f"rte_med={np.median(rte):.2f} rre_med={np.median(rre):.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return succ


if __name__ == "__main__":
    for miss, fp in [(0.3, 0.05), (0.5, 0.05), (0.6, 0.10)]:
        for w in [1.0, 0.5, 0.2, 0.05]:
            run_cell(miss, fp, w)
