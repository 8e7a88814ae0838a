"""Train-step backward/optimizer ablation (VERDICT r2 next-step 8).

Round 2 carried the forward rewrites into a 41 ms train step at B=8 but
never decomposed the backward half.  This probe times, AOT-compiled and
data-chained (BENCH_NOTES methodology):

  fwd        — eval-mode forward + loss (no grad, no BN update)
  fwd_bwd    — value_and_grad of the training loss (train-mode forward
               incl. BN stat updates + full backward)
  train      — the production train step (fwd_bwd + Adam + state update)
  train_remat— same with cfg.remat=True (PointNet MLP rematerialisation)

backward cost  = fwd_bwd - fwd;  optimizer cost = train - fwd_bwd.
Run on the TPU (no env vars):  python scripts/perf_probe10.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.train.engine import Engine

B = 8
REPS = 30


def timeit(name, exe, *args):
    out = exe(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = exe(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:12s}: {dt:7.1f} ms/step  ({1e3/dt*B:6.1f} samples/s)",
          flush=True)
    return dt


def chained_train(engine, state, batch, n):
    """n train steps chained through the state (no retrace: same dtypes)."""
    rng = jax.random.PRNGKey(1)
    t0 = None
    for i in range(n + 1):
        state, metrics = engine.train_step(state, batch, rng)
        if i == 0:
            jax.block_until_ready(metrics)   # compile outside timing
            t0 = time.perf_counter()
    jax.block_until_ready(metrics)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / n * 1e3, state


for remat in (False, True):
    cfg = config.oxford(batch_size=B, remat=remat)
    engine = Engine(cfg, steps_per_epoch=100)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size=B, seed=0).items()}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    tag = "remat" if remat else "base"

    if not remat:
        # fwd: eval-mode loss (no BN update / dropout, matches eval_step)
        fwd = jax.jit(engine._eval_step_impl).lower(state, batch).compile()
        t_fwd = timeit(f"{tag}/fwd", fwd, state, batch)

        # fwd+bwd only (train-mode forward + grad, no optimizer)
        def grad_only(state, batch, rng):
            def loss_fn(params):
                out, new_stats = engine._forward(params, state.batch_stats,
                                                 batch, True, rng)
                loss, m = engine._loss_from_out(out, batch)
                return loss, (m, new_stats)
            grads, _ = jax.grad(loss_fn, has_aux=True)(state.params)
            return jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

        gexe = jax.jit(grad_only).lower(state, batch,
                                        jax.random.PRNGKey(1)).compile()
        t_bwd = timeit(f"{tag}/fwd_bwd", gexe, state, batch,
                       jax.random.PRNGKey(1))

    dt, state = chained_train(engine, state, batch, REPS)
    print(f"{tag}/train    : {dt:7.1f} ms/step  ({1e3/dt*B:6.1f} samples/s)",
          flush=True)
    if not remat:
        print(f"  -> backward-only ~ {t_bwd - t_fwd:.1f} ms, "
              f"optimizer+state ~ {dt - t_bwd:.1f} ms", flush=True)
