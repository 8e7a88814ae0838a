"""Exact kNN as a single fused Pallas TPU kernel.

The XLA path (:func:`deepi2p_tpu.ops.knn.knn`) materialises the full
(B, N, M) squared-distance matrix in HBM (84 MB at the Oxford shape
B=8, N=20480, M=128) and then runs a 128-wide ``lax.top_k`` over it —
two full HBM round trips plus a sorting network, measured ~3.6 ms per
call on the bench chip, and the forward makes TWO such calls
(point->node_a and point->node_b; reference difference-tensor pattern:
``models/networks_pc.py:61-64``, ``models/networks_united.py:76-78``).

This kernel never leaves VMEM: for each point tile the (M, T) distance
block is built by direct (db - q)^2 accumulation (the reference's own
formulation — numerically *closer* to it than the |x|^2+|y|^2-2xy MXU
form) and the k minima are peeled off with k masked sublane-min sweeps.
HBM traffic drops from ~170 MB to the ~2 MB of inputs/outputs.

Mosaic constraints respected: all arrays 2D with the point tile on the
lane axis, node axis (M, multiple of 8) on sublanes; no gathers — the
argmin is an iota-select; outputs are (B, k, N) blocks with k equal to
the full array dim.

Tie semantics match ``lax.top_k`` (stable: lowest index first).
Non-differentiable (outputs are stop_gradient'ed); every call site
consumes it on the data side (points/SOM nodes), never on parameters.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_M = 512          # sublane extent of the in-VMEM distance block
POINT_TILE = 2048    # lane-axis tile


def _kernel(q_ref, db_ref, d2_ref, idx_ref, *, k: int):
    q = q_ref[0]                       # (D, T)
    db = db_ref[0]                     # (M, D)
    D = db.shape[1]
    M = db.shape[0]
    d2 = None
    for d in range(D):
        diff = db[:, d:d + 1] - q[d:d + 1, :]           # (M, T)
        d2 = diff * diff if d2 is None else d2 + diff * diff
    # Mosaic iota must be integer-typed
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    for j in range(k):
        m = jnp.min(d2, axis=0, keepdims=True)          # (1, T)
        sel = jnp.min(jnp.where(d2 == m, iota, M),
                      axis=0, keepdims=True)            # first match
        d2_ref[0, j:j + 1, :] = m
        idx_ref[0, j:j + 1, :] = sel
        d2 = jnp.where(iota == sel, jnp.inf, d2)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(query: jax.Array, database: jax.Array, k: int, *,
               interpret: bool = False):
    """Exact k nearest database points per query, fused on TPU.

    Args:
      query: (B, N, D) points; database: (B, M, D) with M % 8 == 0,
      M <= MAX_M, D <= 8.
    Returns:
      (dist2, idx): both (B, N, k), sorted by increasing distance;
      bit-stable tie handling identical to ``lax.top_k``.
    """
    B, N, D = query.shape
    M = database.shape[1]
    assert M % 8 == 0 and M <= MAX_M and k <= M and D <= 8

    T = min(POINT_TILE, -(-N // 128) * 128)
    pad = (-N) % T
    qt = jnp.moveaxis(query.astype(jnp.float32), -1, 1)     # (B, D, N)
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad)))
    Np = N + pad

    d2, idx = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(B, Np // T),
        in_specs=[
            pl.BlockSpec((1, D, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, T), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, k, Np), jnp.int32),
        ),
        interpret=interpret,
    )(qt, database.astype(jnp.float32))
    d2 = jnp.moveaxis(d2[:, :, :N], 1, -1)                  # (B, N, k)
    idx = jnp.moveaxis(idx[:, :, :N], 1, -1)
    return jax.lax.stop_gradient(d2), jax.lax.stop_gradient(idx)


DB_CHUNK = 512       # sublane extent of one streamed database chunk


def _nn1_kernel(q_ref, db_ref, d2_ref, idx_ref):
    """Streaming 1-NN: the grid's minor axis walks database chunks and
    folds each chunk's (sublane-)min into the revisited output block, so
    the full (M, T) — let alone (N, M) — distance matrix never exists."""
    m = pl.program_id(2)
    q = q_ref[0]                       # (D, T)
    db = db_ref[0]                     # (MC, D)
    MC, D = db.shape
    d2 = None
    for d in range(D):
        diff = db[:, d:d + 1] - q[d:d + 1, :]           # (MC, T)
        d2 = diff * diff if d2 is None else d2 + diff * diff
    cmin = jnp.min(d2, axis=0, keepdims=True)           # (1, T)
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    carg = jnp.min(jnp.where(d2 == cmin, iota, MC),
                   axis=0, keepdims=True) + m * MC      # first match

    @pl.when(m == 0)
    def _init():
        d2_ref[0] = cmin
        idx_ref[0] = carg

    @pl.when(m > 0)
    def _fold():
        better = cmin < d2_ref[0]
        d2_ref[0] = jnp.where(better, cmin, d2_ref[0])
        idx_ref[0] = jnp.where(better, carg, idx_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas(query: jax.Array, database: jax.Array, *,
               interpret: bool = False):
    """Exact nearest database point per query, for LARGE databases.

    Unlike :func:`knn_pallas` (whole database resident, M <= 512), the
    database is streamed through VMEM in :data:`DB_CHUNK` slabs with a
    running (min, argmin) carried in the revisited output block — built
    for the ICP inner loop (``register/icp.py``), whose XLA path
    materialised a (N, M) f32 matrix in HBM per iteration.

    Args:
      query: (B, N, D); database: (B, M, D), D <= 8, any M (padded
        internally with a far sentinel).
    Returns:
      (d2, idx): both (B, N), exact f32 / int32; ties resolve to the
      lowest index like ``jnp.argmin``.
    """
    B, N, D = query.shape
    M = database.shape[1]
    assert D <= 8

    T = min(POINT_TILE, -(-N // 128) * 128)
    padn = (-N) % T
    qt = jnp.moveaxis(query.astype(jnp.float32), -1, 1)     # (B, D, N)
    if padn:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, padn)))
    MC = min(DB_CHUNK, -(-M // 8) * 8)
    padm = (-M) % MC
    db = database.astype(jnp.float32)
    if padm:
        # far sentinel: never the minimum unless the whole db is padding
        db = jnp.pad(db, ((0, 0), (0, padm), (0, 0)),
                     constant_values=1e9)
    Np, Mp = N + padn, M + padm

    d2, idx = pl.pallas_call(
        _nn1_kernel,
        grid=(B, Np // T, Mp // MC),
        in_specs=[
            pl.BlockSpec((1, D, T), lambda b, t, m: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, MC, D), lambda b, t, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, T), lambda b, t, m: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, t, m: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ),
        interpret=interpret,
    )(qt, db)
    d2 = d2[:, 0, :N]
    idx = idx[:, 0, :N]
    return jax.lax.stop_gradient(d2), jax.lax.stop_gradient(idx)


_force_pallas = 0


class force_pallas:
    """Trace-time override: inside this context :func:`pallas_eligible`
    ignores the device-count gate.  Used by code that wraps the model in
    ``shard_map`` (:mod:`deepi2p_tpu.parallel.registration`) — there the
    program is manually sharded, so a per-shard ``pallas_call`` is legal
    even on a multi-device mesh."""

    def __enter__(self):
        global _force_pallas
        _force_pallas += 1

    def __exit__(self, *exc):
        global _force_pallas
        _force_pallas -= 1


def pallas_eligible_nn1(query: jax.Array, database: jax.Array) -> bool:
    """Gate for :func:`nn1_pallas` (no M cap — the database streams)."""
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() != 1 and not _force_pallas:
        return False
    return query.shape[-1] <= 8


def pallas_eligible(query: jax.Array, database: jax.Array, k: int) -> bool:
    """Trace-time gate for auto-dispatch from :func:`ops.knn.knn`.

    Restricted to single-device programs unless inside :class:`force_pallas`:
    the sharded train step is partitioned by GSPMD from input shardings
    (``parallel/mesh.py``), and a ``pallas_call`` is opaque to that
    partitioner — under a multi-device mesh it must be wrapped in
    ``shard_map`` instead (the batch axis is embarrassingly parallel, so
    per-shard invocation is trivial; see ``parallel/registration.py``)."""
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() != 1 and not _force_pallas:
        return False
    M, D = database.shape[1], database.shape[2]
    return M % 8 == 0 and M <= MAX_M and k <= M and D <= 8
