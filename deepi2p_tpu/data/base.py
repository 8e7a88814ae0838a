"""Shared loader machinery: camera math, point-cloud sampling, node FPS.

Dataset-agnostic pieces of the reference loaders, re-implemented torch- and
open3d-free:

  * intrinsics scaling / cropping (``data/kitti_helper.py:193-203``);
  * the crop-scale-randomcrop image pipeline shared by all loaders
    (``data/kitti_pc_img_pose_loader.py:329-349``,
    ``data/oxford_pc_img_pose_loader.py:240-259``);
  * resample-to-N with voxel pre-downsample when the cloud is >2N
    (``data/kitti_pc_img_pose_loader.py:298-306``);
  * FPS node sampling from a random 8x subset
    (``data/kitti_pc_img_pose_loader.py:416-423``).

Every sample is a dict of fixed-shape float32 arrays in the channel-last
layout of the framework (points (N, 3)); ``collate`` stacks samples into the
batch dict consumed by :class:`deepi2p_tpu.train.Engine`.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..config import Config
from ..ops.sampling import (farthest_point_sample_np, voxel_downsample_np,
                            random_resample_np)
from .augmentation import jitter, color_jitter


# --------------------------------------------------------------------------
# camera intrinsics
# --------------------------------------------------------------------------

def scale_K(K: np.ndarray, s: float) -> np.ndarray:
    Ks = K * s
    Ks[2, 2] = 1.0
    return Ks


def crop_K(K: np.ndarray, dx: float, dy: float) -> np.ndarray:
    Kc = K.copy()
    Kc[0, 2] -= dx
    Kc[1, 2] -= dy
    return Kc


_REDUCED_DECODE = {0.5: "IMREAD_REDUCED_COLOR_2",
                   0.25: "IMREAD_REDUCED_COLOR_4",
                   0.125: "IMREAD_REDUCED_COLOR_8"}


def load_image(path: str, cfg: Config):
    """jpg/png decode, at reduced resolution when ``img_scale`` is a power
    of 1/2 and the crop rows stay integral — the decoder then downscales in
    the DCT domain, ~4x faster than full decode + resize (the single most
    expensive host op at full resolution).

    Returns (img RGB uint8, pre_scaled: bool).
    """
    import cv2
    s = cfg.img_scale
    if (s in _REDUCED_DECODE
            and float(cfg.crop_original_top_rows * s).is_integer()
            and float(cfg.crop_original_bottom_rows * s).is_integer()):
        flag = getattr(cv2, _REDUCED_DECODE[s])
        img = cv2.imread(path, flag)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB), True
    return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB), False


def process_image(img: np.ndarray, K: np.ndarray, cfg: Config, *,
                  train: bool, rng: np.random.Generator,
                  pre_scaled: bool = False):
    """top/bottom-crop -> scale -> random (train) / center crop to (H, W).

    ``pre_scaled`` means the decoder already applied ``img_scale`` (see
    :func:`load_image`); the crop offsets are then applied in scaled
    coordinates — the same physical crop window.

    Returns (img float32 HxWx3 in [0,255], K adjusted).
    """
    import cv2
    s = cfg.img_scale
    if pre_scaled:
        top = int(round(cfg.crop_original_top_rows * s))
        bot = int(round(cfg.crop_original_bottom_rows * s))
        if top:
            img = img[top:]
        if bot:
            img = img[:img.shape[0] - bot]
        K = scale_K(K, s)
        K = crop_K(K, 0, top)
    else:
        if cfg.crop_original_top_rows:
            img = img[cfg.crop_original_top_rows:]
            K = crop_K(K, 0, cfg.crop_original_top_rows)
        if cfg.crop_original_bottom_rows:
            img = img[:img.shape[0] - cfg.crop_original_bottom_rows]
        img = cv2.resize(img, (int(round(img.shape[1] * s)),
                               int(round(img.shape[0] * s))),
                         interpolation=cv2.INTER_LINEAR)
        K = scale_K(K, s)
    if train:
        dx = rng.integers(0, img.shape[1] - cfg.img_W + 1)
        dy = rng.integers(0, img.shape[0] - cfg.img_H + 1)
    else:
        dx = (img.shape[1] - cfg.img_W) // 2
        dy = (img.shape[0] - cfg.img_H) // 2
    img = img[dy:dy + cfg.img_H, dx:dx + cfg.img_W]
    K = crop_K(K, dx, dy)
    return img.astype(np.float32), K.astype(np.float32)


# --------------------------------------------------------------------------
# point cloud assembly
# --------------------------------------------------------------------------

def resample_points(pc: np.ndarray, extras: List[np.ndarray], n: int,
                    rng: np.random.Generator, voxel: float):
    """(N0,3) -> exactly n points; voxel pre-downsample when N0 > 2n."""
    if pc.shape[0] > 2 * n:
        extra_cat = np.concatenate(extras, axis=1) if extras else None
        if extra_cat is not None:
            pc, extra_cat = voxel_downsample_np(pc, voxel, extra_cat)
            splits = np.cumsum([e.shape[1] for e in extras])[:-1]
            extras = list(np.split(extra_cat, splits, axis=1))
        else:
            pc = voxel_downsample_np(pc, voxel)
    idx = random_resample_np(pc.shape[0], n, rng)
    return pc[idx], [e[idx] for e in extras]


def sample_nodes(pc: np.ndarray, num: int, rng: np.random.Generator,
                 oversample: int = 8) -> np.ndarray:
    """FPS over a random ``oversample * num`` subset
    (``data/kitti_pc_img_pose_loader.py:416-423``).

    Uses the native C++ core (``native/deepi2p_data.cpp``) when built,
    numpy otherwise.
    """
    from . import native
    pool = min(pc.shape[0], oversample * num)
    sub = pc[rng.choice(pc.shape[0], pool, replace=False)]
    if native.available():
        idx = native.fps(sub, num, seed=int(rng.integers(2 ** 63)))
        return sub[idx].astype(np.float32)
    nodes, _ = farthest_point_sample_np(sub, num, rng)
    return nodes.astype(np.float32)


def assemble_sample(cfg: Config, rng: np.random.Generator, *,
                    pc: np.ndarray, intensity: np.ndarray, sn: np.ndarray,
                    img: np.ndarray, K: np.ndarray, P: np.ndarray,
                    t_ij: np.ndarray) -> Dict[str, np.ndarray]:
    """Finalize a sample: FPS nodes + dtype/shape normalisation."""
    node_a = sample_nodes(pc, cfg.node_a_num, rng)
    node_b = sample_nodes(pc, cfg.node_b_num, rng)
    return dict(
        pc=pc.astype(np.float32),
        intensity=intensity.astype(np.float32).reshape(-1, 1),
        sn=sn.astype(np.float32),
        node_a=node_a, node_b=node_b,
        P=P[:3, :4].astype(np.float32),
        img=img.astype(np.float32),
        K=K.astype(np.float32),
        t_ij=t_ij.astype(np.float32),
    )


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def augment_points(pc, intensity, sn, rng, *, jitter_sn: bool):
    """Gaussian jitter on points (+ normals for KITTI, + intensity for
    Oxford) — ``kitti_pc_img_pose_loader.py:108-118`` vs
    ``oxford_pc_img_pose_loader.py:116-127``."""
    pc = jitter(pc, rng)
    if jitter_sn:
        sn = jitter(sn, rng)
    else:
        intensity = jitter(intensity, rng)
    return pc, intensity, sn


def maybe_color_jitter(img: np.ndarray, rng: np.random.Generator,
                       p: float = 1.0) -> np.ndarray:
    if rng.random() < p:
        return color_jitter(img.astype(np.uint8), rng).astype(np.float32)
    return img


def crop_pc_with_img(pc: np.ndarray, extras: List[np.ndarray],
                     img_shape, K: np.ndarray):
    """Keep only points whose projection lands inside the image
    (``data/kitti_helper.py:166-190``).  pc (N, 3) in camera coords."""
    H, W = img_shape[:2]
    proj = pc @ K.T
    uv = np.round(proj[:, :2] / proj[:, 2:3])
    keep = ((uv[:, 0] >= 0) & (uv[:, 0] <= W - 1) &
            (uv[:, 1] >= 0) & (uv[:, 1] <= H - 1))
    return pc[keep], [e[keep] for e in extras]
