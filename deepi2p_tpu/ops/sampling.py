"""Point sampling: farthest-point sampling and voxel-grid downsampling.

Replaces ``FarthestSampler`` (``data/kitti_helper.py:224-243``), the
open3d-based ``voxel_downsample`` (``data/kitti_helper.py:246-250``, also
``data/oxford_pc_img_pose_loader.py:27-40``) and the random down/up-sampling
in the loaders (``data/kitti_pc_img_pose_loader.py:158-171``).

Two FPS implementations are provided:
  * ``farthest_point_sample_np`` — host-side numpy, matching the reference's
    loader semantics (runs in data-pipeline workers).
  * ``farthest_point_sample`` — on-device ``lax.fori_loop`` variant for
    fully-fused TPU pipelines (batched via vmap).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Host-side (numpy) — data pipeline
# --------------------------------------------------------------------------

def farthest_point_sample_np(pts: np.ndarray, k: int,
                             rng: np.random.Generator | None = None):
    """FPS over (N, D) points -> (samples (k, D), indices (k,)).

    Same greedy algorithm as ``data/kitti_helper.py:224-243`` (random first
    point, then repeated farthest selection).
    """
    rng = rng or np.random.default_rng()
    n = pts.shape[0]
    idx = np.zeros(k, dtype=np.int64)
    idx[0] = rng.integers(n)
    d = np.sum((pts - pts[idx[0]]) ** 2, axis=1)
    for i in range(1, k):
        idx[i] = int(np.argmax(d))
        d = np.minimum(d, np.sum((pts - pts[idx[i]]) ** 2, axis=1))
    return pts[idx], idx


def voxel_downsample_np(pc: np.ndarray, voxel_size: float,
                        extra: np.ndarray | None = None):
    """Voxel-grid average downsampling of (N, 3) points (numpy, no open3d).

    Matches open3d's ``voxel_down_sample``: all points in a voxel are
    averaged.  If ``extra`` (N, E) is given (intensity / normals), it is
    averaged per voxel as well — mirroring
    ``downsample_with_intensity_sn`` (``data/kitti_pc_img_pose_loader.py:26-44``).
    """
    coords = np.floor(pc / voxel_size).astype(np.int64)
    coords -= coords.min(axis=0)
    # Unique voxel key.
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    out = np.zeros((len(uniq), 3), dtype=np.float64)
    np.add.at(out, inv, pc)
    out /= counts[:, None]
    if extra is None:
        return out.astype(pc.dtype)
    eout = np.zeros((len(uniq), extra.shape[1]), dtype=np.float64)
    np.add.at(eout, inv, extra)
    eout /= counts[:, None]
    return out.astype(pc.dtype), eout.astype(extra.dtype)


def random_resample_np(n_have: int, n_want: int,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Random index selection to exactly ``n_want`` points.

    Downsample without replacement; upsample by appending random duplicates
    (``data/kitti_pc_img_pose_loader.py:158-171``).
    """
    rng = rng or np.random.default_rng()
    if n_have >= n_want:
        return rng.choice(n_have, n_want, replace=False)
    dup = rng.choice(n_have, n_want - n_have, replace=True)
    return np.concatenate([np.arange(n_have), dup])


def projective_farthest_sample_np(pts: np.ndarray, k: int, K: np.ndarray,
                                  rng: np.random.Generator | None = None):
    """FPS in projected 2D pixel space, returning the 3D points.

    Mirrors ``ProjectiveFarthestSampler`` (``data/kitti_helper.py:206-221``):
    project with K, run 2D FPS, gather the corresponding 3D points.
    """
    rng = rng or np.random.default_rng()
    proj = pts @ K.T                      # (N, 3)
    uv = proj[:, :2] / proj[:, 2:3]
    _, idx = farthest_point_sample_np(uv, k, rng)
    return pts[idx], idx


# --------------------------------------------------------------------------
# On-device (JAX)
# --------------------------------------------------------------------------

def farthest_point_sample(pts: jax.Array, k: int, key: jax.Array):
    """On-device FPS: (N, D) -> indices (k,) int32.

    ``lax.fori_loop`` with static trip count k; O(kN) like the reference but
    vectorised over N on the VPU.  vmap over a batch axis for (B, N, D).
    """
    n = pts.shape[0]
    first = jax.random.randint(key, (), 0, n)

    def body(i, state):
        idx, dist = state
        nxt = jnp.argmax(dist).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        d_new = jnp.sum((pts - pts[nxt]) ** 2, axis=1)
        return idx, jnp.minimum(dist, d_new)

    idx0 = jnp.zeros(k, jnp.int32).at[0].set(first.astype(jnp.int32))
    dist0 = jnp.sum((pts - pts[first]) ** 2, axis=1)
    idx, _ = jax.lax.fori_loop(1, k, body, (idx0, dist0))
    return idx


def fps_approximate_np(pc: np.ndarray, voxel_size: float, node_num: int,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Approximate FPS: voxel-downsample until enough points remain, then
    randomly pick ``node_num`` (``data/kitti_helper.py:253-258``)."""
    rng = rng or np.random.default_rng()
    down = voxel_downsample_np(pc, voxel_size)
    while down.shape[0] < node_num:
        voxel_size *= 0.75
        down = voxel_downsample_np(pc, voxel_size)
    return down[rng.choice(down.shape[0], node_num, replace=False)]
