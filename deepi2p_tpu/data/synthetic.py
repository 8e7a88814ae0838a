"""Synthetic geometry-consistent batches.

Used by the unit tests, the benchmark, and the multi-chip dry-run: random
point clouds with a known camera pose and intrinsics, shaped exactly like
the real loaders' 9-tuple contract
(``data/kitti_pc_img_pose_loader.py:444-446``) minus the metadata fields.
No real data or pretrained weights required — exercises every layer
including the solvers (SURVEY.md §7 "minimum end-to-end slice").
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import Config


def _random_pose(rng: np.random.Generator, cfg: Config) -> np.ndarray:
    """Random pose with the dataset's perturbation amplitudes
    (``kitti/options.py:39-44`` etc.)."""
    ax = rng.uniform(-cfg.P_Rx_amplitude, cfg.P_Rx_amplitude)
    ay = rng.uniform(-cfg.P_Ry_amplitude, cfg.P_Ry_amplitude)
    az = rng.uniform(-cfg.P_Rz_amplitude, cfg.P_Rz_amplitude)
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    t = np.array([rng.uniform(-cfg.P_tx_amplitude, cfg.P_tx_amplitude),
                  rng.uniform(-cfg.P_ty_amplitude, cfg.P_ty_amplitude),
                  rng.uniform(-cfg.P_tz_amplitude, cfg.P_tz_amplitude)])
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = R.astype(np.float32)
    P[:3, 3] = t.astype(np.float32)
    return P


def _street_cloud(rng: np.random.Generator, n: int):
    """(pc, sn, intensity) of :func:`_street_scene` — kept for callers
    that only need the cloud."""
    pc, sn, inten, _ = _street_scene(rng, n)
    return pc, sn, inten


def _street_scene(rng: np.random.Generator, n: int):
    """Structured scene: points ON surfaces (ground plane, two street
    facades, box obstacles), with true surface normals and per-surface
    reflectance.

    Translation identifiability: for a *uniform* cloud, shifting the
    camera leaves the frustum-membership pattern statistically unchanged
    (the cost is flat in t under label noise — measured in the round-2i
    e2e runs, BENCH_NOTES.md).  Surfaces create large coherent label
    blocks whose boundaries move rigidly with the camera, so the membership
    cost pins all 4 DoF.

    Reflectance is structured like real LiDAR intensity: each facade
    segment ("building") and each box carries its own base level plus
    small per-point noise, so the rendered image shows coherent
    bright/dark regions that correspond to coherent intensity regions of
    the cloud — a learnable cross-modal cue (round-3: per-point-random
    intensity gave the classifier nothing region-level to match, and the
    dominant e2e failure was whole-wedge yaw confusion).
    Returns (pc (n,3), sn (n,3), intensity (n,1)) float32 plus the
    analytic scene parameters (for :func:`raycast_street_depth` — the
    surfaces the points were sampled from, so a DENSE GT depth map is
    computable by ray casting instead of the sparse point splat);
    y is vertical (+y is down: the ground plane sits at y=+2 with normal
    (0,-1,0) and the camera at y=0).
    """
    n_g = int(n * 0.4)
    n_f = int(n * 0.4)
    n_b = n - n_g - n_f
    # ground plane y = +2 (camera at y=0)
    g = np.stack([rng.uniform(-30, 30, n_g),
                  2.0 + rng.normal(0, 0.05, n_g),
                  rng.uniform(-40, 40, n_g)], axis=-1)
    g_n = np.tile(np.array([0.0, -1.0, 0.0]), (n_g, 1))
    g_i = rng.uniform(0.05, 0.25) + rng.normal(0, 0.04, n_g)
    # two facades x = -wl / +wr, full height, segmented into "buildings"
    # of distinct reflectance every ~8-15 m along z
    wl, wr = rng.uniform(8, 16), rng.uniform(8, 16)
    left = rng.random(n_f) < 0.5
    x = np.where(left, -wl, wr) + rng.normal(0, 0.05, n_f)
    fz = rng.uniform(-40, 40, n_f)
    f = np.stack([x, rng.uniform(-6, 2, n_f), fz], axis=-1)
    f_n = np.stack([np.where(left, 1.0, -1.0), np.zeros(n_f),
                    np.zeros(n_f)], axis=-1)
    seg_len = rng.uniform(8.0, 15.0)
    seg_phase = rng.uniform(0.0, seg_len)
    seg = np.floor((fz + 40.0 + seg_phase) / seg_len).astype(int) \
        + 16 * left.astype(int)
    seg_levels = rng.uniform(0.3, 1.0, 48)
    f_i = seg_levels[seg % 48] + rng.normal(0, 0.04, n_f)
    # box obstacles (cars): sample inside, push to the nearest face
    nbox = 6
    centers = np.stack([rng.uniform(-6, 6, nbox),
                        np.full(nbox, 1.0),
                        rng.uniform(-35, 35, nbox)], axis=-1)
    sizes = rng.uniform(1.5, 4.0, (nbox, 3))
    box_levels = rng.uniform(0.3, 1.0, nbox)
    bi = rng.integers(0, nbox, n_b)
    local = rng.uniform(-0.5, 0.5, (n_b, 3))
    face_ax = np.argmax(np.abs(local), axis=1)
    onehot = np.eye(3)[face_ax]
    sign = np.sign(local[np.arange(n_b), face_ax])[:, None]
    local = local * (1.0 - onehot) + 0.5 * sign * onehot
    b = centers[bi] + local * sizes[bi]
    b_n = (sign * onehot).astype(np.float64)
    b_i = box_levels[bi] + rng.normal(0, 0.04, n_b)
    pc = np.concatenate([g, f, b]).astype(np.float32)
    sn = np.concatenate([g_n, f_n, b_n]).astype(np.float32)
    inten = np.clip(np.concatenate([g_i, f_i, b_i]), 0.0, 1.0)
    inten = inten.astype(np.float32)[:, None]
    perm = rng.permutation(n)
    scene = dict(wl=float(wl), wr=float(wr), ground_y=2.0,
                 ground_x=30.0, zmax=40.0, facade_ymin=-6.0,
                 facade_ymax=2.0, box_min=(centers - 0.5 * sizes),
                 box_max=(centers + 0.5 * sizes))
    return pc[perm], sn[perm], inten[perm], scene


def raycast_street_depth(scene: dict, P: np.ndarray, K: np.ndarray,
                         H: int, W: int, far: float = 88.0) -> np.ndarray:
    """DENSE GT depth (H, W) float32 of a street scene by ray casting its
    analytic surfaces (the splat z-buffer in :func:`synthetic_batch` is
    sparse — ~N/(H*W) coverage — which leaves a monodepth net
    unsupervised on most pixels; the pseudo point cloud for the ICP
    pipeline then samples exactly those unsupervised pixels.  The
    reference's monodepth2 stage trains on real dense photometric
    supervision, ``evaluation/icp/save_depth_map.py:60-102``; dense
    analytic depth is the synthetic-world equivalent).

    ``P`` is the (3|4, 4) world->camera pose (``cam = R x + t``), ``K``
    the intrinsics.  Rays that exit the scene (out past the sampled
    ground/facade extents) get depth ``far`` — a supervised "void" the
    net can learn to saturate, which :func:`deepi2p_tpu.eval.depth.
    dump_pseudo_pointclouds` can then drop via ``max_depth``.
    """
    R, t = np.asarray(P[:3, :3], np.float64), np.asarray(P[:3, 3],
                                                         np.float64)
    C = -R.T @ t                           # camera centre, world frame
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64) + 0.5,
                         np.arange(H, dtype=np.float64) + 0.5)
    # dir_c has z == 1, so the ray parameter s IS the z-buffer depth
    dir_c = np.stack([(us - K[0, 2]) / K[0, 0],
                      (vs - K[1, 2]) / K[1, 1],
                      np.ones_like(us)], axis=-1).reshape(-1, 3)
    d = dir_c @ R                          # == R.T @ dir_c, world frame
    eps = 1e-12
    best = np.full(d.shape[0], np.inf)

    def consider(s, valid):
        nonlocal best
        ok = valid & (s > 0.1)
        best = np.where(ok & (s < best), s, best)

    # ground plane y = ground_y, bounded |x| <= ground_x, |z| <= zmax
    den = d[:, 1]
    s = (scene["ground_y"] - C[1]) / np.where(np.abs(den) < eps, eps, den)
    hit = C[None] + s[:, None] * d
    consider(s, (np.abs(den) >= eps) & (np.abs(hit[:, 0]) <= scene["ground_x"])
             & (np.abs(hit[:, 2]) <= scene["zmax"]))
    # facades x = -wl / +wr, y in [facade_ymin, facade_ymax], |z| <= zmax
    for x0 in (-scene["wl"], scene["wr"]):
        den = d[:, 0]
        s = (x0 - C[0]) / np.where(np.abs(den) < eps, eps, den)
        hit = C[None] + s[:, None] * d
        consider(s, (np.abs(den) >= eps)
                 & (hit[:, 1] >= scene["facade_ymin"])
                 & (hit[:, 1] <= scene["facade_ymax"])
                 & (np.abs(hit[:, 2]) <= scene["zmax"]))
    # box obstacles: AABB slab test
    safe_d = np.where(np.abs(d) < eps, eps, d)
    for bmin, bmax in zip(scene["box_min"], scene["box_max"]):
        t0 = (bmin[None] - C[None]) / safe_d
        t1 = (bmax[None] - C[None]) / safe_d
        tnear = np.max(np.minimum(t0, t1), axis=1)
        tfar = np.min(np.maximum(t0, t1), axis=1)
        consider(tnear, tnear <= tfar)

    depth = np.where(np.isfinite(best), best, far)
    return np.minimum(depth, far).reshape(H, W).astype(np.float32)


def synthetic_batch(cfg: Config, batch_size: int | None = None,
                    seed: int = 0, with_depth: bool = False,
                    dense_depth: bool = False
                    ) -> Dict[str, np.ndarray]:
    """A full training batch of synthetic data (numpy, host-side).

    ``with_depth=True`` adds a ``depth`` key (B, H, W) float32: the
    z-buffered GT depth of the rendered points, 0 where no point projects
    — the training target for the monocular depth net that feeds the ICP
    pipeline (the reference's monodepth2 stage,
    ``evaluation/icp/save_depth_map.py:60-102``).  ``dense_depth=True``
    (street scenes only) replaces the sparse splat target with the DENSE
    analytic depth of :func:`raycast_street_depth` — every pixel
    supervised, scene-exit rays at the far cap.
    """
    rng = np.random.default_rng(seed)
    B = batch_size or cfg.batch_size
    N, Ma, Mb = cfg.input_pt_num, cfg.node_a_num, cfg.node_b_num

    scenes = None
    if getattr(cfg, "synthetic_scene", "uniform") == "street":
        clouds = [_street_scene(rng, N) for _ in range(B)]
        pc = np.stack([c[0] for c in clouds])
        sn = np.stack([c[1] for c in clouds])
        intensity = np.stack([c[2] for c in clouds])
        scenes = [c[3] for c in clouds]
    else:
        # Points roughly in front of a camera at ~5..40 m, some behind.
        pc = np.stack([rng.uniform(-30, 30, (B, N)),
                       rng.uniform(-5, 5, (B, N)),
                       rng.uniform(-10, 40, (B, N))], axis=-1).astype(np.float32)
        sn = rng.normal(size=(B, N, 3)).astype(np.float32)
        sn /= np.linalg.norm(sn, axis=-1, keepdims=True)
        intensity = rng.uniform(0, 1, (B, N, 1)).astype(np.float32)

    # draw the pose in camera convention; for nuScenes the configured
    # rotation axis is ENU-z (nuscenes_t/options.py:42), which IS camera-y
    # after the convention change below — so draw it as camera yaw here.
    pose_cfg = cfg if cfg.dataset != "nuscenes" else cfg.replace(
        P_Ry_amplitude=cfg.P_Rz_amplitude, P_Rz_amplitude=0.0)
    P = np.stack([_random_pose(rng, pose_cfg)[:3] for _ in range(B)])
    P_cam = P.copy()   # camera-convention pose (pre nuScenes ENU re-expr.)
    if cfg.dataset == "nuscenes":
        # nuScenes clouds live in ENU (z up) and the random rotation is
        # about z (``nuscenes_t/options.py:42``); the eval path converts
        # back with enu2cam (``registration_lsq.py:237-248``).  Generate
        # in camera convention (above), then re-express cloud+pose in ENU:
        # pc_cam = pc_enu @ C3.T  and  P_cam = P_enu @ C^-1, so the
        # projected geometry — and therefore the labels — is unchanged.
        C = np.array([[1, 0, 0, 0], [0, 0, -1, 0],
                      [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
        pc = pc @ C[:3, :3]
        sn = sn @ C[:3, :3]
        P4 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        P4[:, :3] = P
        P = (P4 @ C[None])[:, :3]

    node_idx_a = rng.choice(N, (B, Ma))
    node_idx_b = rng.choice(N, (B, Mb))
    node_a = np.take_along_axis(pc, node_idx_a[..., None], axis=1)
    node_b = np.take_along_axis(pc, node_idx_b[..., None], axis=1)
    f = 0.6 * cfg.img_W
    K = np.tile(np.array([[f, 0, cfg.img_W / 2],
                          [0, f, cfg.img_H / 2],
                          [0, 0, 1]], np.float32), (B, 1, 1))
    # Render the cloud into the camera (depth/intensity splat + noise):
    # with an informative image the camera pose IS recoverable from the
    # inputs, so training on synthetic data exercises the real
    # cross-modal task, not just the machinery (a pure-noise image makes
    # the coarse labels information-theoretically unpredictable).
    img = rng.uniform(0, 60, (B, cfg.img_H, cfg.img_W, 3)).astype(np.float32)
    depth_gt = (np.zeros((B, cfg.img_H, cfg.img_W), np.float32)
                if with_depth else None)
    # img_render_n: splat only the first rn (permuted => uniform subset)
    # points so the image density is independent of input_pt_num — the
    # reference's camera-image invariant (see config.Config.img_render_n)
    rn = getattr(cfg, "img_render_n", 0) or N
    for b in range(B):
        cam = pc[b, :rn] @ P[b, :3, :3].T + P[b, :3, 3]
        z = cam[:, 2]
        front = z > 0.1
        u = (K[b, 0, 0] * cam[:, 0] / np.where(front, z, 1.0)
             + K[b, 0, 2]).astype(np.int32)
        v = (K[b, 1, 1] * cam[:, 1] / np.where(front, z, 1.0)
             + K[b, 1, 2]).astype(np.int32)
        m = front & (u >= 0) & (u < cfg.img_W) & (v >= 0) & (v < cfg.img_H)
        # z-buffer: splat far-to-near so the NEAREST point wins every pixel
        # collision deterministically (an arbitrary-order splat leaves
        # random winners wherever points overlap, i.e. inconsistent image
        # evidence for the classifier to learn from).
        order = np.argsort(-z[m], kind="stable")
        vi, ui, zi = v[m][order], u[m][order], z[m][order]
        ii = intensity[b, :rn, 0][m][order]
        depth_c = np.clip(255.0 * 5.0 / np.maximum(zi, 1.0), 0, 255)
        img[b, vi, ui, 0] = depth_c
        img[b, vi, ui, 1] = ii * 255.0
        img[b, vi, ui, 2] = 128.0
        if depth_gt is not None:
            depth_gt[b, vi, ui] = zi

    if depth_gt is not None and dense_depth:
        if scenes is None:
            raise ValueError("dense_depth=True needs synthetic_scene="
                             "'street' (analytic surfaces to ray cast)")
        depth_gt = np.stack([
            raycast_street_depth(scenes[b], P_cam[b], K[b],
                                 cfg.img_H, cfg.img_W) for b in range(B)])
    out = dict(pc=pc, intensity=intensity, sn=sn, node_a=node_a,
               node_b=node_b, P=P.astype(np.float32), img=img, K=K)
    if depth_gt is not None:
        out["depth"] = depth_gt
    return out


class SyntheticDataset:
    """Iterable of synthetic batches (for smoke-training runs).

    ``fresh=True`` makes the generator *procedural over epochs*: after
    ``set_epoch(e)`` every index maps to a never-seen-before scene, so a
    training run draws ``epochs x length`` distinct scenes instead of
    re-iterating a finite set — the round-2 street-scene runs memorized
    2048 fixed scenes (train 0.96 / val 0.77 coarse accuracy); fresh
    scenes are what the infinite-data regime of the reference's 100k+
    real pairs looks like synthetically.
    """

    def __init__(self, cfg: Config, length: int = 16, seed: int = 0,
                 fresh: bool = False):
        self.cfg, self.length, self.seed = cfg, length, seed
        self.fresh = fresh
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch) if self.fresh else 0

    def _seed(self, i: int) -> int:
        # disjoint seed spaces: dataset seed picks a 2^40-wide block,
        # (epoch, index) walks inside it — no train/val collisions even
        # over very long fresh-scene runs.
        return (self.seed << 40) + self.epoch * self.length + i

    def __len__(self):
        return self.length

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        """A single sample (unbatched) — for BatchLoader compatibility."""
        b = synthetic_batch(self.cfg, batch_size=1, seed=self._seed(i))
        return {k: v[0] for k, v in b.items()}

    def __iter__(self):
        for i in range(self.length):
            yield synthetic_batch(self.cfg, seed=self._seed(i))
