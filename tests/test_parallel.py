"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model compile / oracle / e2e tier (see pytest.ini)

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.parallel import make_mesh, shard_batch, ShardedEngine
from deepi2p_tpu.parallel.mesh import shard_state


@pytest.fixture(scope="module")
def cfg():
    return config.tiny().replace(batch_size=8)


def test_mesh_shapes():
    mesh = make_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(n_model=1)
    assert mesh.shape == {"data": 8, "model": 1}


def test_dp_train_step_runs_and_matches_single(cfg):
    """One DP step over 8 devices must match the single-device step."""
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=0).items()}

    from deepi2p_tpu.train import Engine
    ref_eng = Engine(cfg, steps_per_epoch=10)
    ref_state = ref_eng.init_state(jax.random.PRNGKey(0), batch)
    ref_state2, ref_metrics = ref_eng.train_step(ref_state, batch,
                                                 jax.random.PRNGKey(42))

    mesh = make_mesh(n_model=1)
    eng = ShardedEngine(cfg, mesh, steps_per_epoch=10)
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    sbatch = eng.place_batch(batch)
    state2, metrics = eng.train_step(state, sbatch, jax.random.PRNGKey(42))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["coarse_accuracy"]),
                               float(ref_metrics["coarse_accuracy"]),
                               atol=1e-6)
    # Note: parameters after one Adam step are NOT compared — the first Adam
    # update is ~lr*sign(grad), so reduction-order noise flips signs.
    assert int(state2.step) == 1 and int(ref_state2.step) == 1


def test_sharded_registration_matches_single_device(cfg):
    """The shard_map'ed forward+solve pipeline (the v5e-8 scaling path of
    the bench workload) is layout-independent: per-pair PRNG keys make the
    8-way data-parallel result identical to the single-device one."""
    from deepi2p_tpu.models import KeypointDetector
    from deepi2p_tpu.parallel.registration import (
        make_sharded_registration, pair_keys, place_for_registration)
    from deepi2p_tpu.register.frustum import (
        initial_guess, sample_inits, solve_frustum_batch)

    model = KeypointDetector(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=2).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["pc"],
                           batch["intensity"], batch["sn"], batch["node_a"],
                           batch["node_b"], batch["img"], train=False)
    keys = pair_keys(jax.random.PRNGKey(7), cfg.batch_size)
    n_inits, max_iter = 8, 4

    def apply_fn(v, b):
        coarse, _ = model.apply(v, b["pc"], b["intensity"], b["sn"],
                                b["node_a"], b["node_b"], b["img"],
                                train=False)
        return coarse

    # single-device reference (same per-pair keys -> same inits)
    coarse = apply_fn(variables, batch)
    pred = jnp.argmax(coarse, axis=-1)
    ang, _ = jax.vmap(initial_guess)(batch["pc"], pred)
    theta0 = jax.vmap(lambda k, a: sample_inits(k, a, n_inits))(keys, ang)
    P_ref, cost_ref = solve_frustum_batch(
        batch["pc"], pred, batch["K"], H=cfg.img_H, W=cfg.img_W,
        n_inits=n_inits, max_iter=max_iter, theta0=theta0)

    mesh = make_mesh(n_model=1)
    step = make_sharded_registration(mesh, apply_fn, H=cfg.img_H,
                                     W=cfg.img_W, n_inits=n_inits,
                                     max_iter=max_iter)
    sv, sb, sk = place_for_registration(mesh, variables, batch, keys)
    P_sh, cost_sh = step(sv, sb, sk)
    np.testing.assert_allclose(np.asarray(P_sh), np.asarray(P_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cost_sh), np.asarray(cost_ref),
                               rtol=1e-4, atol=1e-3)


def test_tp_sharded_params_step(cfg):
    """data=4 x model=2 mesh: wide kernels sharded over 'model'."""
    mesh = make_mesh(n_model=2)
    eng = ShardedEngine(cfg, mesh, steps_per_epoch=10)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=1).items()}
    state = eng.init_state(jax.random.PRNGKey(0), batch)

    # at least one kernel actually sharded over 'model'
    def sharded_over_model(x):
        s = getattr(x, "sharding", None)
        return s is not None and "model" in getattr(s, "spec", ())
    n_sharded = sum(bool(sharded_over_model(l))
                    for l in jax.tree.leaves(state.params))
    assert n_sharded > 0

    sbatch = eng.place_batch(batch)
    state2, metrics = eng.train_step(state, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
