"""Fused Pallas kNN kernel vs brute-force numpy (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.ops.knn import knn
from deepi2p_tpu.ops.knn_pallas import knn_pallas


def _brute(q, db, k):
    d2 = ((q[:, :, None, :] - db[:, None, :, :]) ** 2).sum(-1)  # (B,N,M)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(d2, idx, axis=-1), idx


def test_knn_pallas_matches_bruteforce(rng):
    B, N, M, k = 2, 300, 64, 3          # N not a multiple of 128: pad path
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    db = rng.normal(size=(B, M, 3)).astype(np.float32)
    d2_p, idx_p = knn_pallas(jnp.asarray(q), jnp.asarray(db), k,
                             interpret=True)
    d2_b, idx_b = _brute(q, db, k)
    np.testing.assert_array_equal(np.asarray(idx_p), idx_b)
    np.testing.assert_allclose(np.asarray(d2_p), d2_b, rtol=1e-5, atol=1e-6)


def test_knn_pallas_tie_handling_matches_topk(rng):
    """Duplicate database points: stable lowest-index-first like top_k."""
    B, N, M, k = 1, 128, 16, 4
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    db = rng.normal(size=(B, M, 3)).astype(np.float32)
    db[0, 7] = db[0, 2]                  # exact duplicate -> tied distances
    db[0, 11] = db[0, 2]
    d2_p, idx_p = knn_pallas(jnp.asarray(q), jnp.asarray(db), k,
                             interpret=True)
    d2_b, idx_b = _brute(q, db, k)
    np.testing.assert_array_equal(np.asarray(idx_p), idx_b)


def test_knn_pallas_k16(rng):
    B, N, M, k = 1, 128, 128, 16
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    db = rng.normal(size=(B, M, 3)).astype(np.float32)
    d2_p, idx_p = knn_pallas(jnp.asarray(q), jnp.asarray(db), k,
                             interpret=True)
    d2_b, idx_b = _brute(q, db, k)
    np.testing.assert_array_equal(np.asarray(idx_p), idx_b)
    np.testing.assert_allclose(np.asarray(d2_p), d2_b, rtol=1e-5, atol=1e-6)


def test_knn_both_paths_exact_vs_bruteforce(rng):
    """Both kNN paths must reproduce brute-force f32 indices EXACTLY.

    On CPU this is trivially true; run with ``DEEPI2P_TEST_PLATFORM=axon``
    it becomes the real guard: on TPU, f32 matmuls silently execute as
    bf16 passes unless precision=HIGHEST — before that fix the MXU
    pairwise-distance path flipped 3.6% (k=3) / 6.1% (k=16) of neighbour
    indices on-chip (measured), while the compiled Pallas kernel was
    bit-exact (direct (db-q)^2, the reference's own formulation).
    """
    import jax
    from deepi2p_tpu.ops.knn import pairwise_dist2
    B, N, M, k = 2, 2048, 128, 3
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    db = rng.normal(size=(B, M, 3)).astype(np.float32)
    d2_b, idx_b = _brute(q, db, k)
    on_tpu = jax.default_backend() == "tpu"
    d2p, idxp = knn_pallas(jnp.asarray(q), jnp.asarray(db), k,
                           interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(idxp), idx_b)
    neg, idxx = jax.lax.top_k(-pairwise_dist2(jnp.asarray(q),
                                              jnp.asarray(db)), k)
    np.testing.assert_array_equal(np.asarray(idxx), idx_b)
    np.testing.assert_allclose(np.asarray(-neg), d2_b, rtol=1e-4, atol=1e-5)


def test_knn_xla_path_unchanged_on_cpu(rng):
    """On CPU the public knn() keeps the MXU top_k path (no pallas)."""
    q = rng.normal(size=(1, 64, 3)).astype(np.float32)
    db = rng.normal(size=(1, 16, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(db), 3)
    _, idx_b = _brute(q, db, 3)
    np.testing.assert_array_equal(np.asarray(idx), idx_b)


def test_nn1_streaming_matches_bruteforce(rng):
    """The streaming 1-NN kernel (large-M databases, ICP inner loop) is
    exact vs numpy brute force, including the db-padding branch and
    chunk-boundary tie semantics."""
    from deepi2p_tpu.ops.knn_pallas import nn1_pallas
    B, N, M = 2, 300, 1100          # M spans 3 chunks (pad branch: 1100->1104)
    q = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    db = rng.normal(size=(B, M, 3)).astype(np.float32) * 5
    d2 = np.sum((q[:, :, None, :] - db[:, None, :, :]) ** 2, axis=-1)
    idx_b = np.argmin(d2, axis=-1)
    d2_b = np.min(d2, axis=-1)
    on_tpu = jax.default_backend() == "tpu"
    d2p, idxp = nn1_pallas(jnp.asarray(q), jnp.asarray(db),
                           interpret=not on_tpu)
    np.testing.assert_array_equal(np.asarray(idxp), idx_b)
    np.testing.assert_allclose(np.asarray(d2p), d2_b, rtol=1e-5, atol=1e-5)


def test_nn1_under_vmap(rng):
    """nn1_pallas must batch correctly under vmap — the ICP harness vmaps
    the per-init solve, so the pallas batching rule adds a grid dim."""
    from deepi2p_tpu.ops.knn_pallas import nn1_pallas
    I, N, M = 3, 150, 520
    q = rng.normal(size=(I, N, 3)).astype(np.float32)
    db = rng.normal(size=(M, 3)).astype(np.float32)
    on_tpu = jax.default_backend() == "tpu"
    fn = lambda qi: nn1_pallas(qi[None], jnp.asarray(db)[None],
                               interpret=not on_tpu)
    d2v, idxv = jax.vmap(fn)(jnp.asarray(q))
    d2 = np.sum((q[:, :, None, :] - db[None, None, :, :]) ** 2, axis=-1)
    np.testing.assert_array_equal(np.asarray(idxv)[:, 0], np.argmin(d2, -1))
