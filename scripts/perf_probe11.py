"""Train-step batch-size sweep: amortizing the relay's per-dispatch cost.

The sync-free epoch loop still measures ~0.19 s/step wall at B=8 against
a ~41 ms on-chip step (BENCH_NOTES round 2): the tunneled relay appears
to serialize execute calls, so the fixed per-dispatch latency dominates.
If so, samples/s should scale strongly with batch size — this times the
production train step, chained through state (no retrace), at several B.

Run on the TPU (no env vars, chip free):  python scripts/perf_probe11.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.train.engine import Engine

REPS = 20

for B in (8, 16, 32, 64):
    cfg = config.tiny(batch_size=B, input_pt_num=4096, node_a_num=64,
                      node_b_num=64, img_H=96, img_W=160,
                      synthetic_scene="street",
                      k_ab=min(config.tiny().k_ab, 64))
    engine = Engine(cfg, steps_per_epoch=2048)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size=B, seed=0).items()}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    # AOT-compile so a dtype/weak_type flip inside the timed loop raises
    # (a retrace) instead of silently timing minutes of recompilation
    # (BENCH_NOTES methodology; advisor round 3)
    step_c = jax.jit(engine._train_step_impl, donate_argnums=(0,)
                     ).lower(state, batch, rng).compile()
    state, metrics = step_c(state, batch, rng)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, metrics = step_c(state, batch, rng)
    jax.block_until_ready(metrics)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / REPS
    print(f"B={B:3d}: {dt*1e3:7.1f} ms/step  {B/dt:7.1f} samples/s",
          flush=True)
