"""End-of-round benchmark: image<->point-cloud registrations per second.

Measures the full registration hot path on one chip — classifier forward
(argmax coarse predictions) + multi-init Cauchy-LM frustum solve — against
the driver-set north star of 500 registrations/sec (BASELINE.json; the
reference runs 60 Ceres inits x <=500 LM iters on 8 CPU processes,
``evaluation/registration_lsq.py:334-343``).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_REGS_PER_SEC = 500.0


def main():
    from deepi2p_tpu import config
    from deepi2p_tpu.data import synthetic_batch
    from deepi2p_tpu.models import KeypointDetector
    from deepi2p_tpu.register.frustum import solve_frustum_batch

    cfg = config.oxford(batch_size=8)
    model = KeypointDetector(cfg)

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["pc"],
                           batch["intensity"], batch["sn"], batch["node_a"],
                           batch["node_b"], batch["img"], train=False)

    n_inits, max_iter = 60, 64

    @jax.jit
    def register(variables, batch, rng):
        coarse, _fine = model.apply(
            variables, batch["pc"], batch["intensity"], batch["sn"],
            batch["node_a"], batch["node_b"], batch["img"], train=False)
        pred = jnp.argmax(coarse, axis=-1)
        P, cost = solve_frustum_batch(batch["pc"], pred, batch["K"],
                                      H=cfg.img_H, W=cfg.img_W, rng=rng,
                                      n_inits=n_inits, max_iter=max_iter)
        return P, cost

    # warmup / compile
    P, cost = register(variables, batch, jax.random.PRNGKey(0))
    jax.block_until_ready((P, cost))

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        P, cost = register(variables, batch, jax.random.PRNGKey(i))
    jax.block_until_ready((P, cost))
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
