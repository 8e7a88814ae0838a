"""End-of-round benchmark: image<->point-cloud registrations per second.

Measures the full registration hot path on one chip — classifier forward
(argmax coarse predictions) + multi-init Cauchy-LM frustum solve (Pallas
mega-kernel) — against the driver-set north star of 500 registrations/sec
(BASELINE.json; the reference runs 60 Ceres inits x <=500 LM iters on 8 CPU
processes, ``evaluation/registration_lsq.py:334-343``).

Timing methodology (hard-won on this measurement relay, see BENCH_NOTES.md):
  * iterations are data-chained (forward consumes the previous solve's
    scalar carry; the solve consumes the forward's predictions) and the
    final carry is fetched to host — asynchronous dispatch cannot
    under-report;
  * both stages are AOT-compiled (``jit(...).lower(...).compile()``) so a
    retrace/recompile inside the timed loop is *impossible* — an argument
    type mismatch raises instead (a weak_type flip of the carry silently
    cost a full recompile per run in an earlier revision);
  * forward and solve are separate executables: the relay heavily
    penalises very large fused programs.

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
MAX_ITER = 24
# stride-2 refine keeps 32/32 success at 10% label noise on bench-scale
# problems (scripts/perf_probe8.py sweep on the real chip; stride 4 was the
# first config to drop a problem).  Gate: test_bench_config_quality_gate.
SOLVER_STRIDE = 2


def main():
    from deepi2p_tpu import config
    from deepi2p_tpu.data import synthetic_batch
    from deepi2p_tpu.models import KeypointDetector
    from deepi2p_tpu.register.frustum import solve_frustum_batch

    # B=32 amortises the relay's per-op dispatch overhead inside the
    # forward (measured: 532/s at B=8, 622 at B=16, 708 at B=32, 717 at
    # B=64 — the knee is 32; per-pair solver math is batch-independent, so
    # the quality gates are unaffected).  45 ms/batch latency.
    cfg = config.oxford(batch_size=32)
    model = KeypointDetector(cfg)

    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, seed=0).items()}
    init_fn = jax.jit(lambda b: model.init(
        jax.random.PRNGKey(0), b["pc"], b["intensity"], b["sn"], b["node_a"],
        b["node_b"], b["img"], train=False))
    variables = init_fn(batch)

    def forward(variables, batch, carry):
        img = batch["img"] + carry * 0.0
        coarse, _fine = model.apply(
            variables, batch["pc"], batch["intensity"], batch["sn"],
            batch["node_a"], batch["node_b"], img, train=False)
        return jnp.argmax(coarse, axis=-1)

    def solve(pc, pred, K, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 carry.astype(jnp.int32))
        P, cost = solve_frustum_batch(pc, pred, K,
                                      H=cfg.img_H, W=cfg.img_W, rng=rng,
                                      n_inits=N_INITS, max_iter=MAX_ITER,
                                      solver_stride=SOLVER_STRIDE)
        return P, cost, jnp.sum(cost) + jnp.sum(P)

    # AOT compile both stages against the exact loop-time argument types
    carry0 = jnp.zeros((), jnp.float32)
    fwd_exe = jax.jit(forward).lower(variables, batch, carry0).compile()
    pred0 = fwd_exe(variables, batch, carry0)
    solve_exe = jax.jit(solve).lower(batch["pc"], pred0, batch["K"],
                                     carry0).compile()
    _, _, carry = solve_exe(batch["pc"], pred0, batch["K"], carry0)
    assert carry.dtype == carry0.dtype and carry.shape == carry0.shape
    np.asarray(carry)  # sync warmup

    iters = 8
    # two-deep software pipeline: forward(k) chains on solve(k-2)'s carry,
    # solve(k) on forward(k)'s predictions — still a closed dependency
    # chain (nothing can be skipped), but the host can enqueue the next
    # forward while the solve executes, hiding the ~4 ms dispatch latency.
    carry_a = carry                       # solve(k-1) carry
    carry_b = jnp.zeros((), jnp.float32)  # solve(k-2) carry
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = fwd_exe(variables, batch, carry_b)
        carry_b = carry_a
        P, cost, carry_a = solve_exe(batch["pc"], pred, batch["K"], carry_a)
    _ = np.asarray(carry_a)        # host fetch closes the dependency chain
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
