"""Golden-value tests for the numerical core vs naive numpy references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepi2p_tpu.ops import (
    pairwise_dist2, knn, gather_knn,
    node_pool_max, node_mean_and_count, scatter_to_points,
    interpolate_inverse_dist,
    project_points, coarse_labels, fine_labels, generate_labels,
    farthest_point_sample_np, farthest_point_sample,
    voxel_downsample_np, random_resample_np,
)


def test_pairwise_dist2(rng):
    x = rng.normal(size=(2, 7, 3)).astype(np.float32)
    y = rng.normal(size=(2, 5, 3)).astype(np.float32)
    got = np.asarray(pairwise_dist2(jnp.asarray(x), jnp.asarray(y)))
    want = np.sum((x[:, :, None] - y[:, None, :]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_sorted(rng):
    x = rng.normal(size=(1, 50, 3)).astype(np.float32)
    y = rng.normal(size=(1, 20, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(x), jnp.asarray(y), 4)
    d2, idx = np.asarray(d2), np.asarray(idx)
    full = np.sum((x[:, :, None] - y[:, None, :]) ** 2, axis=-1)[0]
    want_idx = np.argsort(full, axis=1)[:, :4]
    np.testing.assert_array_equal(idx[0], want_idx)
    assert np.all(np.diff(d2[0], axis=1) >= -1e-6)


def test_gather_knn(rng):
    f = rng.normal(size=(2, 6, 4)).astype(np.float32)
    idx = rng.integers(0, 6, size=(2, 9, 3))
    got = np.asarray(gather_knn(jnp.asarray(f), jnp.asarray(idx)))
    for b in range(2):
        for n in range(9):
            for k in range(3):
                np.testing.assert_array_equal(got[b, n, k], f[b, idx[b, n, k]])


def test_node_pool_max_values_and_grads(rng):
    B, N, M, C = 2, 40, 8, 5
    f = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, M, size=(B, N)).astype(np.int32)
    # make node 3 of batch 0 empty
    idx[0][idx[0] == 3] = 2
    pooled, has = node_pool_max(jnp.asarray(f), jnp.asarray(idx), M, chunk=16)
    pooled, has = np.asarray(pooled), np.asarray(has)
    for b in range(B):
        for m in range(M):
            sel = f[b][idx[b] == m]
            if len(sel) == 0:
                assert has[b, m] == 0 and np.all(pooled[b, m] == 0)
            else:
                np.testing.assert_allclose(pooled[b, m], sel.max(axis=0), rtol=1e-6)

    # gradient flows only to the argmax element per (node, channel)
    def loss(x):
        p, _ = node_pool_max(x, jnp.asarray(idx), M, chunk=16)
        return jnp.sum(p)
    g = np.asarray(jax.grad(loss)(jnp.asarray(f)))
    # every nonzero grad entry must be 1 and located at a per-node argmax
    nz = np.nonzero(g)
    assert np.all(g[nz] == 1.0)
    for b, n, c in zip(*nz):
        m = idx[b, n]
        sel = f[b][idx[b] == m][:, c]
        assert f[b, n, c] == sel.max()


def test_node_mean_and_count(rng):
    B, N, M = 2, 30, 6
    p = rng.normal(size=(B, N, 3)).astype(np.float32)
    idx = rng.integers(0, M, size=(B, N)).astype(np.int32)
    mean, count = node_mean_and_count(jnp.asarray(p), jnp.asarray(idx), M)
    mean, count = np.asarray(mean), np.asarray(count)
    for b in range(B):
        for m in range(M):
            sel = p[b][idx[b] == m]
            assert count[b, m] == len(sel)
            if len(sel):
                np.testing.assert_allclose(mean[b, m], sel.mean(axis=0),
                                           rtol=1e-4, atol=1e-5)


def test_scatter_to_points(rng):
    f = rng.normal(size=(2, 4, 3)).astype(np.float32)
    idx = rng.integers(0, 4, size=(2, 11)).astype(np.int32)
    got = np.asarray(scatter_to_points(jnp.asarray(f), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], f[b][idx[b]])


def test_interpolate_weights(rng):
    """Weights are 1 - d/sum(d) per the reference (networks_united.py:98)."""
    B, N, M, k, C = 1, 5, 7, 3, 2
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    db = rng.normal(size=(B, M, 3)).astype(np.float32)
    feat = rng.normal(size=(B, M, C)).astype(np.float32)
    _, idx = knn(jnp.asarray(q), jnp.asarray(db), k)
    got = np.asarray(interpolate_inverse_dist(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(feat), idx))
    idx = np.asarray(idx)
    for n in range(N):
        d = np.linalg.norm(q[0, n] - db[0, idx[0, n]], axis=1)
        w = 1 - d / d.sum()
        want = (w[:, None] * feat[0, idx[0, n]]).sum(axis=0)
        np.testing.assert_allclose(got[0, n], want, rtol=1e-4, atol=1e-5)


def test_interpolate_degenerate_neighbourhood():
    """Coincident / duplicated neighbours must not produce NaN (forward:
    0/0 weight ratio; backward: norm gradient at 0).  FPS nodes ARE cloud
    points and duplicate nodes occur after resampling, so this is a
    real-data case — found via dryrun_multichip(3) loss=NaN."""
    q = jnp.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]])
    db = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                     [0.0, 0.0, 0.0], [2.0, 2.0, 2.0]]])
    feat = jnp.ones((1, 4, 5))
    _, idx = knn(q, db, 3)
    out = interpolate_inverse_dist(q, db, feat, idx)
    assert np.isfinite(np.asarray(out)).all()
    # all-equal distances -> uniform weights 1 - 1/3, summing to 2 (k=3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 2.0, rtol=1e-4)
    g = jax.grad(lambda qq: interpolate_inverse_dist(qq, db, feat, idx).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_projection_and_labels():
    H, W, scale = 64, 96, 32
    K = np.array([[[50.0, 0, 48], [0, 50, 32], [0, 0, 1]]], np.float32)
    P = np.tile(np.eye(4, dtype=np.float32)[None, :3], (1, 1, 1))
    pc = np.array([[[0.0, 0.0, 5.0],     # centre -> inside
                    [0.0, 0.0, -5.0],    # behind -> outside
                    [10.0, 0.0, 1.0],    # off to the right -> outside
                    [-0.5, -0.3, 1.0]]], np.float32)  # inside, off-centre
    pxpy, z = project_points(jnp.asarray(pc), jnp.asarray(P), jnp.asarray(K))
    c = np.asarray(coarse_labels(pxpy, z, H, W))
    np.testing.assert_array_equal(c[0], [1, 0, 0, 1])
    labels = generate_labels(jnp.asarray(pc), jnp.asarray(P), jnp.asarray(K),
                             H, W, scale)
    W_fine = W // scale
    pxpy = np.asarray(pxpy)
    for i in [0, 3]:
        cell = int(pxpy[0, i, 0] // scale) + int(pxpy[0, i, 1] // scale) * W_fine
        assert int(np.asarray(labels.fine)[0, i]) == cell
    assert np.all(np.asarray(labels.fine) >= 0)
    assert np.all(np.asarray(labels.fine) < W_fine * (H // scale))


def test_fps_np_and_device(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    samples, idx = farthest_point_sample_np(pts, 10, rng)
    assert len(set(idx.tolist())) == 10
    np.testing.assert_array_equal(samples, pts[idx])

    didx = np.asarray(farthest_point_sample(jnp.asarray(pts), 10,
                                            jax.random.PRNGKey(0)))
    assert len(set(didx.tolist())) == 10


def test_voxel_downsample(rng):
    pc = np.array([[0.01, 0.01, 0.01],
                   [0.02, 0.02, 0.02],
                   [1.5, 1.5, 1.5]], np.float32)
    out = voxel_downsample_np(pc, 0.1)
    assert out.shape[0] == 2
    got = sorted(out.tolist())
    np.testing.assert_allclose(got[0], [0.015, 0.015, 0.015], atol=1e-6)
    np.testing.assert_allclose(got[1], [1.5, 1.5, 1.5], atol=1e-6)

    extra = rng.normal(size=(3, 2)).astype(np.float32)
    out2, e2 = voxel_downsample_np(pc, 0.1, extra)
    assert out2.shape[0] == 2 and e2.shape == (2, 2)


def test_random_resample(rng):
    idx = random_resample_np(100, 40, rng)
    assert len(idx) == 40 and len(set(idx.tolist())) == 40
    idx = random_resample_np(30, 50, rng)
    assert len(idx) == 50 and set(range(30)) <= set(idx.tolist())
