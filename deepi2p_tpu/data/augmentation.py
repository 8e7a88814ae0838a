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

def _blend(a: np.ndarray, b, f: float) -> np.ndarray:
    """clip(f*a + (1-f)*b); b may be an array or a scalar (cv2 SIMD path,
    GIL-released — the numpy version dominated loader CPU time)."""
    import cv2
    a32 = a if a.dtype == np.float32 else a.astype(np.float32)
    if np.isscalar(b) or getattr(b, "ndim", 1) == 0:
        out = cv2.convertScaleAbs(a32, alpha=f, beta=(1.0 - f) * float(b))
        return out.astype(np.float32)
    b32 = b if b.dtype == np.float32 else b.astype(np.float32)
    return np.clip(cv2.addWeighted(a32, f, b32, 1.0 - f, 0.0), 0, 255)


def _adjust_brightness(img, f):
    return _blend(img, 0.0, f)


def _adjust_contrast(img, f):
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    return _blend(img, float(gray.mean()), f)


def _adjust_saturation(img, f):
    import cv2
    gray = (img @ np.array([0.299, 0.587, 0.114], np.float32))[..., None]
    return _blend(img, cv2.merge([gray, gray, gray]).reshape(img.shape), f)


def _adjust_hue(img, shift):
    """Hue rotation by ``shift`` (fraction of a full turn, in [-0.5, 0.5]).

    Uses cv2's SIMD HSV conversion (~40x faster than the numpy HSV math —
    this was the single most expensive op of the whole host pipeline).
    """
    import cv2
    u8 = np.clip(img, 0, 255).astype(np.uint8)
    hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV_FULL)
    h = hsv[..., 0].astype(np.int32) + int(round(shift * 256.0))
    hsv[..., 0] = (h % 256).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB_FULL).astype(img.dtype)


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1)) -> np.ndarray:
    """Random-order brightness/contrast/saturation/hue jitter, uint8 HxWx3."""
    img = img.astype(np.float32)
    ops = [
        lambda x: _adjust_brightness(x, rng.uniform(*brightness)),
        lambda x: _adjust_contrast(x, rng.uniform(*contrast)),
        lambda x: _adjust_saturation(x, rng.uniform(*saturation)),
        lambda x: _adjust_hue(x, rng.uniform(*hue)),
    ]
    for k in rng.permutation(4):
        img = ops[k](img)
    return np.clip(img, 0, 255).astype(np.uint8)
