"""On-device (jax) synthetic batch generation — the TPU-native data path.

Round-4 measurement: street-scene training is HOST-bound, not chip-bound
— the numpy generator (``synthetic.py``) costs ~35 ms/sample on this
container's single CPU core (~573 s/epoch of generation) while the chip
finishes the 2048 train steps in ~84 s and idles ~84% of the epoch.  The
TPU-first fix is to generate the batch ON the device with ``jax.random``:
scene synthesis is embarrassingly parallel math (uniform draws, a couple
of small gathers, one z-buffer scatter per image), XLA fuses it into a
few kernels, and the host pipeline plus the host→device image transfer
disappear entirely.

Semantics mirror ``synthetic.synthetic_batch`` (same scene family,
surface mix, reflectance structure, pose amplitudes, z-buffered
rendering) so a run can switch generators mid-stream: scenes are FRESH
every epoch anyway, so only the distribution must match, not the RNG
stream.  Distribution parity is tested in
``tests/test_synthetic_jax.py`` (surface fractions, label statistics,
image value ranges vs the numpy generator).

The z-buffer uses two scatters instead of the host's far-to-near splat:
``min``-scatter the depth, then ``max``-scatter payloads masked to
winners of that depth race — identical nearest-point-wins images up to
exact depth ties.  Reference provenance as in ``synthetic.py``
(shape contract ``data/kitti_pc_img_pose_loader.py:444-446``).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config


def _euler_pose(key, cfg: Config):
    """Random pose with the dataset's perturbation amplitudes
    (``kitti/options.py:39-44``), R = Rz @ Ry @ Rx — matches
    ``synthetic._random_pose``."""
    ks = jax.random.split(key, 6)
    amp = jnp.array([cfg.P_Rx_amplitude, cfg.P_Ry_amplitude,
                     cfg.P_Rz_amplitude], jnp.float32)
    ang = jax.random.uniform(ks[0], (3,), minval=-1.0, maxval=1.0) * amp
    ax, ay, az = ang[0], ang[1], ang[2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    tamp = jnp.array([cfg.P_tx_amplitude, cfg.P_ty_amplitude,
                      cfg.P_tz_amplitude], jnp.float32)
    t = jax.random.uniform(ks[1], (3,), minval=-1.0, maxval=1.0) * tamp
    P = jnp.eye(4, dtype=jnp.float32)
    return P.at[:3, :3].set(R.astype(jnp.float32)).at[:3, 3].set(t)


def _street_cloud(key, n: int):
    """Device-side mirror of ``synthetic._street_cloud`` (ground plane +
    two segmented facades + box obstacles, true normals, per-surface
    reflectance).  Returns (pc (n,3), sn (n,3), intensity (n,1))."""
    n_g = int(n * 0.4)
    n_f = int(n * 0.4)
    n_b = n - n_g - n_f
    ks = jax.random.split(key, 20)

    # ground plane y = +2 (camera at y = 0), normal -y
    g = jnp.stack([jax.random.uniform(ks[0], (n_g,), minval=-30, maxval=30),
                   2.0 + 0.05 * jax.random.normal(ks[1], (n_g,)),
                   jax.random.uniform(ks[2], (n_g,), minval=-40, maxval=40)],
                  axis=-1)
    g_n = jnp.tile(jnp.array([0.0, -1.0, 0.0]), (n_g, 1))
    g_base = jax.random.uniform(ks[3], (), minval=0.05, maxval=0.25)
    g_i = g_base + 0.04 * jax.random.normal(ks[4], (n_g,))

    # two facades x = -wl / +wr, segmented into "buildings" along z
    wl = jax.random.uniform(ks[5], (), minval=8, maxval=16)
    wr = jax.random.uniform(ks[6], (), minval=8, maxval=16)
    left = jax.random.uniform(ks[7], (n_f,)) < 0.5
    x = jnp.where(left, -wl, wr) + 0.05 * jax.random.normal(ks[8], (n_f,))
    fz = jax.random.uniform(ks[9], (n_f,), minval=-40, maxval=40)
    f = jnp.stack([x,
                   jax.random.uniform(ks[10], (n_f,), minval=-6, maxval=2),
                   fz], axis=-1)
    f_n = jnp.stack([jnp.where(left, 1.0, -1.0), jnp.zeros(n_f),
                     jnp.zeros(n_f)], axis=-1)
    seg_len = jax.random.uniform(ks[11], (), minval=8.0, maxval=15.0)
    seg_phase = jax.random.uniform(ks[12], (), maxval=1.0) * seg_len
    seg = jnp.floor((fz + 40.0 + seg_phase) / seg_len).astype(jnp.int32) \
        + 16 * left.astype(jnp.int32)
    seg_levels = jax.random.uniform(ks[13], (48,), minval=0.3, maxval=1.0)
    f_i = seg_levels[seg % 48] + 0.04 * jax.random.normal(ks[14], (n_f,))

    # box obstacles ("cars"): sample inside the unit box, push to the
    # nearest face, scale/translate per box
    nbox = 6
    centers = jnp.stack(
        [jax.random.uniform(ks[15], (nbox,), minval=-6, maxval=6),
         jnp.full((nbox,), 1.0),
         jax.random.uniform(ks[16], (nbox,), minval=-35, maxval=35)],
        axis=-1)
    sizes = jax.random.uniform(ks[17], (nbox, 3), minval=1.5, maxval=4.0)
    box_levels = jax.random.uniform(ks[18], (nbox,), minval=0.3, maxval=1.0)
    kb1, kb2, kb3, kperm = jax.random.split(ks[19], 4)
    bi = jax.random.randint(kb1, (n_b,), 0, nbox)
    local = jax.random.uniform(kb2, (n_b, 3), minval=-0.5, maxval=0.5)
    face_ax = jnp.argmax(jnp.abs(local), axis=1)
    onehot = jnp.eye(3)[face_ax]
    sign = jnp.sign(local[jnp.arange(n_b), face_ax])[:, None]
    local = local * (1.0 - onehot) + 0.5 * sign * onehot
    b = centers[bi] + local * sizes[bi]
    b_n = sign * onehot
    b_i = box_levels[bi] + 0.04 * jax.random.normal(kb3, (n_b,))

    pc = jnp.concatenate([g, f, b]).astype(jnp.float32)
    sn = jnp.concatenate([g_n, f_n, b_n]).astype(jnp.float32)
    inten = jnp.clip(jnp.concatenate([g_i, f_i, b_i]), 0.0, 1.0)
    perm = jax.random.permutation(kperm, n)
    return pc[perm], sn[perm], inten[perm].astype(jnp.float32)[:, None]


def _uniform_cloud(key, n: int):
    k1, k2, k3 = jax.random.split(key, 3)
    lo = jnp.array([-30.0, -5.0, -10.0])
    hi = jnp.array([30.0, 5.0, 40.0])
    pc = lo + (hi - lo) * jax.random.uniform(k1, (n, 3))
    sn = jax.random.normal(k2, (n, 3))
    sn = sn / jnp.linalg.norm(sn, axis=-1, keepdims=True)
    inten = jax.random.uniform(k3, (n, 1))
    return pc.astype(jnp.float32), sn.astype(jnp.float32), \
        inten.astype(jnp.float32)


def _render(pc, intensity, P, K, H: int, W: int, key, with_depth: bool):
    """z-buffered splat: nearest point wins each pixel.  Two scatters:
    a ``min`` race on depth, then ``max`` payload scatters masked to the
    race winners (the depth channel is monotone in z so it needs no
    mask).  Matches the host renderer's far-to-near stable splat up to
    exact depth ties.

    precision=HIGHEST on the projection: the TPU default runs bf16
    passes, which moves ~0.2% of points across a pixel boundary vs the
    host renderer (caught by test_renderer_matches_host_splat on-chip,
    round 5) — and the LABELS for these points are computed in exact f32
    (ops/projection.py), so a bf16 image splat would put image evidence
    and supervision on different pixels near boundaries."""
    cam = jnp.matmul(pc, P[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + P[:3, 3]
    z = cam[:, 2]
    front = z > 0.1
    zs = jnp.where(front, z, 1.0)
    u = jnp.floor(K[0, 0] * cam[:, 0] / zs + K[0, 2]).astype(jnp.int32)
    v = jnp.floor(K[1, 1] * cam[:, 1] / zs + K[1, 2]).astype(jnp.int32)
    m = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    # flat pixel index; invalid points land in a pad slot that is sliced
    # away (TPU-friendly: no dynamic shapes, scatter stays in one kernel)
    p = jnp.where(m, v * W + u, H * W)
    zbig = jnp.float32(1e9)
    zimg = jnp.full((H * W + 1,), zbig).at[p].min(
        jnp.where(m, z, zbig).astype(jnp.float32))
    win = m & (z <= zimg[p] + 1e-6)
    winf = win.astype(jnp.float32)
    depth_c = jnp.clip(255.0 * 5.0 / jnp.maximum(z, 1.0), 0, 255)
    ch0 = jnp.zeros((H * W + 1,)).at[p].max(depth_c * winf)
    ch1 = jnp.zeros((H * W + 1,)).at[p].max(intensity[:, 0] * 255.0 * winf)
    has_pt = (zimg[:H * W] < zbig).reshape(H, W)
    noise = jax.random.uniform(key, (H, W, 3), minval=0.0, maxval=60.0)
    splat = jnp.stack([ch0[:H * W].reshape(H, W),
                       ch1[:H * W].reshape(H, W),
                       jnp.full((H, W), 128.0)], axis=-1)
    img = jnp.where(has_pt[..., None], splat, noise).astype(jnp.float32)
    if not with_depth:
        return img, None
    depth = jnp.where(has_pt, zimg[:H * W].reshape(H, W), 0.0)
    return img, depth.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "batch_size",
                                             "with_depth"))
def synthetic_batch_jax(cfg: Config, key, batch_size: int | None = None,
                        with_depth: bool = False) -> Dict[str, jax.Array]:
    """Device-side equivalent of ``synthetic.synthetic_batch``: one jitted
    program producing the full batch pytree on the accelerator."""
    B = batch_size or cfg.batch_size
    N, Ma, Mb = cfg.input_pt_num, cfg.node_a_num, cfg.node_b_num
    H, W = cfg.img_H, cfg.img_W
    street = getattr(cfg, "synthetic_scene", "uniform") == "street"

    pose_cfg = cfg if cfg.dataset != "nuscenes" else cfg.replace(
        P_Ry_amplitude=cfg.P_Rz_amplitude, P_Rz_amplitude=0.0)

    # img_render_n: splat a fixed-size (already permuted => uniform)
    # subset so the image density is independent of input_pt_num — the
    # reference's camera-image invariant (config.Config.img_render_n)
    rn = getattr(cfg, "img_render_n", 0) or N

    def one(k):
        kc, kp, ka, kb, kr = jax.random.split(k, 5)
        pc, sn, inten = (_street_cloud(kc, N) if street
                         else _uniform_cloud(kc, N))
        P = _euler_pose(kp, pose_cfg)[:3]
        node_a = pc[jax.random.randint(ka, (Ma,), 0, N)]
        node_b = pc[jax.random.randint(kb, (Mb,), 0, N)]
        f = 0.6 * W
        K = jnp.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                      jnp.float32)
        img, depth = _render(pc[:rn], inten[:rn], P, K, H, W, kr,
                             with_depth)
        out = dict(pc=pc, intensity=inten, sn=sn, node_a=node_a,
                   node_b=node_b, P=P, img=img, K=K)
        if with_depth:
            out["depth"] = depth
        return out

    batch = jax.vmap(one)(jax.random.split(key, B))

    if cfg.dataset == "nuscenes":
        # ENU convention change, as in synthetic.synthetic_batch: the
        # projected geometry (and labels) is invariant to it.
        # HIGHEST: at TPU default precision these matmuls run bf16
        # passes, quantizing coordinates to ~0.1 m at 40 m range BEFORE
        # exact-f32 label generation sees them.
        hi = jax.lax.Precision.HIGHEST
        C = jnp.array([[1, 0, 0, 0], [0, 0, -1, 0],
                       [0, 1, 0, 0], [0, 0, 0, 1]], jnp.float32)
        for k in ("pc", "sn", "node_a", "node_b"):
            batch[k] = jnp.matmul(batch[k], C[:3, :3], precision=hi)
        P4 = jnp.tile(jnp.eye(4), (batch["P"].shape[0], 1, 1))
        P4 = P4.at[:, :3].set(batch["P"])
        batch["P"] = jnp.matmul(P4, C[None], precision=hi)[:, :3]

    return batch


@functools.partial(jax.jit, static_argnames=("cfg", "k_steps",
                                             "batch_size"))
def synthetic_stacked_jax(cfg: Config, key, k_steps: int,
                          batch_size: int | None = None
                          ) -> Dict[str, jax.Array]:
    """(K, B, ...) stacked batches for ``Engine.train_step_scan`` — one
    device dispatch generates the whole dispatch window's data."""
    keys = jax.random.split(key, k_steps)
    return jax.vmap(lambda kk: synthetic_batch_jax(cfg, kk, batch_size))(keys)
