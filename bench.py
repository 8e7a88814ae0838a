"""End-of-round benchmark: image<->point-cloud registrations per second.

Measures the full registration hot path on one chip — classifier forward
(argmax coarse predictions) + multi-init Cauchy-LM frustum solve (Pallas
mega-kernel) — against the driver-set north star of 500 registrations/sec
(BASELINE.json; the reference runs 60 Ceres inits x <=500 LM iters on 8 CPU
processes, ``evaluation/registration_lsq.py:334-343``).

Timing is artifact-proof: iterations are data-chained (each step's input
derives from the previous step's output) and the final result is fetched to
host, so asynchronous dispatch cannot under-report.

The forward and the solve are dispatched as two executables: the
measurement relay heavily penalises large fused programs (see
BENCH_NOTES.md); per-dispatch overhead (~4 ms) is negligible next to it.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_REGS_PER_SEC = 500.0
N_INITS = 64           # rounded to the pallas init-block (reference: 60)
MAX_ITER = 24          # pallas kernel runs all inits to completion
SOLVER_STRIDE = 2      # uniform point subsample in the LM (quality-checked)


def main():
    from deepi2p_tpu import config
    from deepi2p_tpu.data import synthetic_batch
    from deepi2p_tpu.models import KeypointDetector
    from deepi2p_tpu.register.frustum import solve_frustum_batch

    cfg = config.oxford(batch_size=8)
    model = KeypointDetector(cfg)

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    init_fn = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))
    variables = init_fn(batch)

    @jax.jit
    def forward(variables, batch, carry):
        img = batch["img"] + carry * 0.0
        coarse, _fine = model.apply(
            variables, batch["pc"], batch["intensity"], batch["sn"],
            batch["node_a"], batch["node_b"], img, train=False)
        return jnp.argmax(coarse, axis=-1)

    @jax.jit
    def solve(pc, pred, K, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 carry.astype(jnp.int32))
        P, cost = solve_frustum_batch(pc, pred, K,
                                      H=cfg.img_H, W=cfg.img_W, rng=rng,
                                      n_inits=N_INITS, max_iter=MAX_ITER,
                                      solver_stride=SOLVER_STRIDE)
        return P, cost, jnp.sum(cost) + jnp.sum(P)

    # warmup / compile; fetch to host to guarantee completion
    carry = jnp.zeros(())
    pred = forward(variables, batch, carry)
    P, cost, carry = solve(batch["pc"], pred, batch["K"], carry)
    carry = jnp.asarray(float(np.asarray(carry)))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        # data chain: forward depends on last solve's carry, solve on forward
        pred = forward(variables, batch, carry)
        P, cost, carry = solve(batch["pc"], pred, batch["K"], carry)
    _ = np.asarray(carry)          # host fetch closes the dependency chain
    dt = time.perf_counter() - t0

    regs_per_sec = cfg.batch_size * iters / dt
    print(json.dumps({
        "metric": "registrations_per_sec",
        "value": round(regs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(regs_per_sec / BASELINE_REGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
