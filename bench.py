"""End-of-round benchmark: image<->point-cloud registrations per second.

Measures the full registration hot path on one chip — classifier forward
(argmax coarse predictions) + multi-init Cauchy-LM frustum solve — against
the driver-set north star of 500 registrations/sec (BASELINE.json; the
reference runs 60 Ceres inits x <=500 LM iters on 8 CPU processes,
``evaluation/registration_lsq.py:334-343``).

Timing is artifact-proof: iterations are data-chained (each step's rng is
derived from the previous step's output) and the final result is fetched to
host, so asynchronous dispatch cannot under-report.

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
    def register(variables, batch, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 carry.astype(jnp.int32))
        coarse, _fine = model.apply(
            variables, batch["pc"], batch["intensity"], batch["sn"],
            batch["node_a"], batch["node_b"], batch["img"], train=False)
        pred = jnp.argmax(coarse, axis=-1)
        P, cost = solve_frustum_batch(batch["pc"], pred, batch["K"],
                                      H=cfg.img_H, W=cfg.img_W, rng=rng,
                                      n_inits=N_INITS, max_iter=MAX_ITER,
                                      solver_stride=SOLVER_STRIDE)
        # data-chain: next carry depends on this step's full output
        return P, cost, jnp.sum(cost) + jnp.sum(P)

    # warmup / compile; fetch to host to guarantee completion
    P, cost, carry = register(variables, batch, jnp.zeros(()))
    carry = jnp.asarray(float(np.asarray(carry)))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        P, cost, carry = register(variables, batch, carry)
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
