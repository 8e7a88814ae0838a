"""Data-parallel registration pipeline over a device mesh.

The bench hot path (classifier forward -> argmax -> multi-init frustum LM)
is embarrassingly parallel over pairs, so on a pod slice it is sharded over
the 'data' axis with ``shard_map``: every chip runs the full per-pair
pipeline on its local shard — including the Pallas mega-kernel and the
fused kNN, which are opaque to the GSPMD partitioner and therefore need
manual sharding.  This is the multi-chip form of the reference's 8-process
solver fan-out (``evaluation/registration_lsq.py:334-343``) and the scaling
story behind the v5e-8 throughput projection in BENCH_NOTES.md.

Layout independence: per-pair PRNG keys (not one batch-wide key) drive the
random initialisations, so the solved poses are bit-identical whether a
pair is processed on one chip or eight — tested on the virtual CPU mesh
(``tests/test_parallel.py``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..register.frustum import initial_guess, sample_inits, solve_frustum_batch


def pair_keys(rng, n_pairs: int):
    """Per-pair PRNG keys (B, 2) uint32 — shardable over 'data'."""
    return jax.random.split(rng, n_pairs)


def make_sharded_registration(mesh: Mesh, apply_fn, *, H: int, W: int,
                              n_inits: int = 64, max_iter: int = 24,
                              solver_stride: int = 1, is_2d: bool = True):
    """Build a jitted SPMD registration step.

    Args:
      mesh: device mesh with a 'data' axis (batch must divide it).
      apply_fn: ``apply_fn(variables, batch) -> coarse_logits (B, N, 2)``
        — typically a closure over ``KeypointDetector.apply``.
      is_2d: True = the reference's eval mode ([ry, tx, ty, tz],
        ``registration_lsq.py:264``); False = full 6-DoF angle-axis mode
        ([rx, ry, rz, tx, ty, tz]) — same shard_map layout, wider theta.
    Returns:
      ``step(variables, batch, keys) -> (P (B,4,4), cost (B,))`` with
      ``batch`` a dict of (B, ...) arrays and ``keys`` from
      :func:`pair_keys`; variables replicated, batch/keys sharded over
      'data'.
    """
    try:
        from jax import shard_map            # jax >= 0.8
    except ImportError:                       # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from ..ops.knn_pallas import force_pallas

    def per_shard(variables, batch, keys):
        coarse = apply_fn(variables, batch)
        pred = jnp.argmax(coarse, axis=-1)
        pc = batch["pc"]
        ang, _ = jax.vmap(initial_guess)(pc, pred)
        theta0 = jax.vmap(
            lambda k, a: sample_inits(k, a, n_inits, is_2d=is_2d))(keys, ang)
        return solve_frustum_batch(pc, pred, batch["K"], H=H, W=W,
                                   n_inits=n_inits, max_iter=max_iter,
                                   solver_stride=solver_stride,
                                   is_2d=is_2d, theta0=theta0)

    data_specs = (P(), P("data"), P("data"))
    # replication checking must be off: the body calls pallas kernels the
    # checker cannot see through.  jax >= 0.8.1 renamed check_rep->check_vma.
    try:
        fn = shard_map(per_shard, mesh=mesh, in_specs=data_specs,
                       out_specs=(P("data"), P("data")), check_vma=False)
    except TypeError:
        fn = shard_map(per_shard, mesh=mesh, in_specs=data_specs,
                       out_specs=(P("data"), P("data")), check_rep=False)

    jitted = jax.jit(fn)

    @functools.wraps(fn)
    def step(variables, batch, keys):
        # the per-shard body uses Pallas kernels where the backend allows —
        # legal under shard_map's manual sharding even on a multi-chip mesh
        with force_pallas():
            return jitted(variables, batch, keys)

    return step


def place_for_registration(mesh: Mesh, variables, batch, keys):
    """Device placement matching :func:`make_sharded_registration`."""
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    return (jax.device_put(variables, rep),
            {k: jax.device_put(v, dat) for k, v in batch.items()},
            jax.device_put(keys, dat))
