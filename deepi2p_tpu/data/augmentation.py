"""Host-side data augmentation (numpy, torch-free).

Covers the reference's augmentation set: euler rotation matrices & point
jitter (``data/augmentation.py:14-52``), the uniform random pose transform
used by every loader (``data/kitti_pc_img_pose_loader.py:136-156``), and a
numpy re-implementation of torchvision ColorJitter with the loaders'
parameters — brightness/contrast/saturation (0.8, 1.2), hue (-0.1, 0.1)
(``data/kitti_pc_img_pose_loader.py:120-134``) — applied in random order
like torchvision's ``ColorJitter.get_params``.
"""
from __future__ import annotations

import numpy as np


def angles_to_rotation(angles) -> np.ndarray:
    """Rz @ Ry @ Rx for euler angles [ax, ay, az] (radians)."""
    ax, ay, az = angles
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def random_transform(rng: np.random.Generator,
                     t_amp=(0.0, 0.0, 0.0), r_amp=(0.0, 0.0, 0.0)
                     ) -> np.ndarray:
    """Uniform random 4x4 pose within the given amplitudes."""
    t = [rng.uniform(-a, a) if a else 0.0 for a in t_amp]
    ang = [rng.uniform(-a, a) if a else 0.0 for a in r_amp]
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = angles_to_rotation(ang).astype(np.float32)
    P[:3, 3] = t
    return P


def jitter(x: np.ndarray, rng: np.random.Generator,
           sigma: float = 0.01, clip: float = 0.05) -> np.ndarray:
    """Per-element clipped Gaussian jitter (``data/augmentation.py:41-52``)."""
    noise = np.clip(sigma * rng.standard_normal(x.shape), -clip, clip)
    return (x + noise).astype(x.dtype)


# --------------------------------------------------------------------------
# coordinate conventions (points are (N, 3) row vectors here)
# (``data/augmentation.py:55-79``, ``data/kitti_helper.py:7-22``)
# --------------------------------------------------------------------------

def cam_to_nwu(pc: np.ndarray) -> np.ndarray:
    """camera (x-right, y-down, z-forward) -> NWU (x-fwd, y-left, z-up)."""
    return np.stack([pc[:, 2], -pc[:, 0], -pc[:, 1]], axis=1)


def nwu_to_cam(pc: np.ndarray) -> np.ndarray:
    return np.stack([-pc[:, 1], -pc[:, 2], pc[:, 0]], axis=1)


def enu_to_cam(pc: np.ndarray) -> np.ndarray:
    """ENU (x-east, y-north, z-up) -> camera."""
    return np.stack([pc[:, 0], -pc[:, 2], pc[:, 1]], axis=1)


# --------------------------------------------------------------------------
# ColorJitter (numpy)
# --------------------------------------------------------------------------

def _blend(a: np.ndarray, b: np.ndarray, f: float) -> np.ndarray:
    return np.clip(f * a + (1.0 - f) * b, 0, 255)


def _adjust_brightness(img, f):
    return _blend(img, np.zeros_like(img), f)


def _adjust_contrast(img, f):
    gray = img @ np.array([0.299, 0.587, 0.114])
    return _blend(img, np.full_like(img, gray.mean()), f)


def _adjust_saturation(img, f):
    gray = (img @ np.array([0.299, 0.587, 0.114]))[..., None]
    return _blend(img, np.broadcast_to(gray, img.shape), f)


def _adjust_hue(img, shift):
    """Hue rotation by ``shift`` (fraction of a full turn, in [-0.5, 0.5])."""
    x = img / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    c = mx - mn
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    safe = np.where(c > 0, c, 1.0)
    h = np.where(mx == r, ((g - b) / safe) % 6,
                 np.where(mx == g, (b - r) / safe + 2, (r - g) / safe + 4)) / 6.0
    h = np.where(c > 0, h, 0.0)
    h = (h + shift) % 1.0
    # HSV -> RGB (v = mx, s = c/mx)
    i = np.floor(h * 6).astype(int)
    f = h * 6 - i
    v = mx
    s = np.where(mx > 0, c / np.where(mx > 0, mx, 1.0), 0.0)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    i = i % 6
    out = np.zeros_like(x)
    for k, (rr, gg, bb) in enumerate([(v, t, p), (q, v, p), (p, v, t),
                                      (p, q, v), (t, p, v), (v, p, q)]):
        m = (i == k)
        out[..., 0] = np.where(m, rr, out[..., 0])
        out[..., 1] = np.where(m, gg, out[..., 1])
        out[..., 2] = np.where(m, bb, out[..., 2])
    return np.clip(out * 255.0, 0, 255)


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1)) -> np.ndarray:
    """Random-order brightness/contrast/saturation/hue jitter, uint8 HxWx3."""
    img = img.astype(np.float64)
    ops = [
        lambda x: _adjust_brightness(x, rng.uniform(*brightness)),
        lambda x: _adjust_contrast(x, rng.uniform(*contrast)),
        lambda x: _adjust_saturation(x, rng.uniform(*saturation)),
        lambda x: _adjust_hue(x, rng.uniform(*hue)),
    ]
    for k in rng.permutation(4):
        img = ops[k](img)
    return img.astype(np.uint8)
