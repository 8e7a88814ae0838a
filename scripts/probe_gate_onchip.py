"""On-chip triage for test_structured_noise_gate (round-5: 3/8 on TPU vs
5/8 CPU at the same seed, gate >=4).

Two competing explanations:
  (a) pallas-kernel numerics — on TPU backend='auto' routes to the
      frustum_pallas mega-kernel, never exercised by this round-3 test
      before this round's on-chip pass;
  (b) init-luck variance — success under 3/32 flipped sectors is a
      near-coin-flip per pair, and an 8-pair sample moves +-2 between
      backends/keys by chance.

Solve the test's exact problem set with both on-chip backends (pallas
mega-kernel and the XLA scan path, which uses HIGHEST-precision matmuls)
across 4 solver keys.  If xla-on-chip tracks CPU (5/8) while pallas sits
low across keys, it is (a) and the kernel needs a precision audit; if
both scatter across 2-6, it is (b) and the gate needs key-pooling, not a
numerics fix.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.projection import project_points, coarse_labels
from deepi2p_tpu.register.frustum import solve_frustum_batch
from deepi2p_tpu.register.metrics import pose_diff_np
from deepi2p_tpu.register.noise import flip_sectors

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]],
                np.float32)


def _make_problem(rng, yaw, t, n=1024):
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 40, n)
    pc = np.stack([r * np.cos(theta),
                   rng.uniform(-2, 2, n),
                   r * np.sin(theta)], axis=-1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    P[:3, 3] = t
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    labels = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    return pc, labels, P


def main():
    B = 8
    rng = np.random.default_rng(11)
    pcs, labs, Ps = [], [], []
    for _ in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)],
                     np.float32)
        pc, labels, P = _make_problem(rng, yaw, t, n=4096)
        labels = flip_sectors(rng, pc, labels, n_sectors=32, n_flipped=3)
        pcs.append(pc); labs.append(labels); Ps.append(P)
    pc = jnp.asarray(np.stack(pcs))
    labels = jnp.asarray(np.stack(labs).astype(np.float32))
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))

    for backend in ("pallas", "xla"):
        for key in range(4):
            P_pred, _ = solve_frustum_batch(
                pc, labels, K, H=H, W=W, rng=jax.random.PRNGKey(key),
                n_inits=64, max_iter=24, solver_stride=1, backend=backend)
            ok = sum(
                1 for b in range(B)
                if (lambda d: d[0] < 2.0 and d[1] < 5.0)(
                    pose_diff_np(np.asarray(P_pred[b], np.float64),
                                 np.asarray(Ps[b], np.float64))))
            print(f"backend={backend} key={key}: {ok}/8", flush=True)


if __name__ == "__main__":
    main()
