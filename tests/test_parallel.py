"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

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
