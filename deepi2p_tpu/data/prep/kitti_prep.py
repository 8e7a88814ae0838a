"""KITTI offline preparation.

Replaces ``data/kitti/kitti_pc_bin_to_npy_with_downsample_sn.py`` (bin ->
voxel-0.1 downsample + surface normals, 22 processes), ``data/
kitti_png_to_npy.py`` and the pose split, open3d-free:

  * velodyne ``.bin`` -> camera-independent NWU cloud with intensity;
  * voxel-grid downsample (native C++ core or numpy);
  * surface normals by local PCA over kNN neighbourhoods (radius-free
    variant of open3d's estimate_normals), oriented to +z like the
    reference (``kitti_pc_bin_to_npy_with_downsample_sn.py:58-61``);
  * per-frame ``.npy`` of shape (7, N): xyz + intensity + normals;
  * image ``.png`` -> ``.npy`` uint8 arrays;
  * ``poses/XX.txt`` (odometry ground truth) -> per-frame ``.npz``
    with a 4x4 'pose' entry, the layout the loader consumes.
"""
from __future__ import annotations

import concurrent.futures as cf
import os

import numpy as np


def estimate_normals(pc: np.ndarray, k: int = 16,
                     orient_positive_z: bool = True) -> np.ndarray:
    """PCA normals over kNN neighbourhoods; (N, 3) -> (N, 3) unit normals."""
    from .. import native
    idx = native.knn(pc, pc, k)                 # (N, k)
    nb = pc[idx]                                # (N, k, 3)
    centered = nb - nb.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    # smallest eigenvector of each 3x3 covariance
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    if orient_positive_z:
        flip = normals[:, 2] < 0
        normals[flip] = -normals[flip]
    n = np.linalg.norm(normals, axis=1, keepdims=True)
    return (normals / np.maximum(n, 1e-12)).astype(np.float32)


def _cam_to_nwu(pc_vel: np.ndarray) -> np.ndarray:
    """Velodyne frame is already x-forward/y-left/z-up == NWU."""
    return pc_vel


def prepare_frame(bin_path: str, out_path: str, *, voxel: float = 0.1,
                  normal_k: int = 16):
    raw = np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)
    pc = _cam_to_nwu(raw[:, :3])
    intensity = raw[:, 3:4]
    from .. import native
    pc_d, inten_d = native.voxel_downsample(pc, voxel, intensity)
    sn = estimate_normals(pc_d, k=normal_k)
    out = np.concatenate([pc_d.T, inten_d.T, sn.T], axis=0).astype(np.float32)
    np.save(out_path, out)
    return out.shape[1]


def prepare_kitti_velodyne(root: str, out_root: str, sequences=None, *,
                           voxel: float = 0.1, workers: int = 8,
                           folder_name: str = "voxel0.1-SNr0.6"):
    """Convert all ``velodyne/*.bin`` of the odometry sequences."""
    sequences = sequences if sequences is not None else list(range(11))
    jobs = []
    for seq in sequences:
        src = os.path.join(root, "sequences", f"{seq:02d}", "velodyne")
        dst = os.path.join(out_root, "sequences", f"{seq:02d}", folder_name)
        if not os.path.isdir(src):
            continue
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if f.endswith(".bin"):
                out = os.path.join(dst, f.replace(".bin", ".npy"))
                if not os.path.exists(out):   # resumable, like the reference
                    jobs.append((os.path.join(src, f), out))
    with cf.ThreadPoolExecutor(workers) as ex:
        list(ex.map(lambda j: prepare_frame(j[0], j[1], voxel=voxel), jobs))
    return len(jobs)


def kitti_png_to_npy(root: str, out_root: str, sequences=None, *,
                     workers: int = 8):
    """``image_2|3/*.png`` -> uint8 ``.npy`` (``data/kitti_png_to_npy.py``)."""
    import cv2
    sequences = sequences if sequences is not None else list(range(11))
    jobs = []
    for seq in sequences:
        for cam in ("image_2", "image_3"):
            src = os.path.join(root, "sequences", f"{seq:02d}", cam)
            dst = os.path.join(out_root, "sequences", f"{seq:02d}", cam)
            if not os.path.isdir(src):
                continue
            os.makedirs(dst, exist_ok=True)
            for f in sorted(os.listdir(src)):
                if f.endswith(".png"):
                    out = os.path.join(dst, f.replace(".png", ".npy"))
                    if not os.path.exists(out):
                        jobs.append((os.path.join(src, f), out))

    def one(j):
        img = cv2.cvtColor(cv2.imread(j[0]), cv2.COLOR_BGR2RGB)
        np.save(j[1], img)

    with cf.ThreadPoolExecutor(workers) as ex:
        list(ex.map(one, jobs))
    return len(jobs)


def kitti_poses_to_npz(poses_txt: str, out_dir: str):
    """Odometry ``poses/XX.txt`` -> per-frame ``XXXXXX.npz{pose: 4x4}``."""
    os.makedirs(out_dir, exist_ok=True)
    mats = np.loadtxt(poses_txt).reshape(-1, 3, 4)
    n = 0
    for i, m in enumerate(mats):
        P = np.eye(4, dtype=np.float32)
        P[:3] = m
        np.savez(os.path.join(out_dir, f"{i:06d}.npz"), pose=P)
        n += 1
    return n


def prepare_frame_in_img_frame(bin_path: str, out_path: str, Pc: np.ndarray,
                               K: np.ndarray, img_shape, *,
                               voxel: float = 0.1, normal_k: int = 16):
    """bin -> npy with the cloud transformed into the CAMERA frame and
    cropped to the image frustum (``data/kitti/kitti_pc_bin_to_npy_in_img_
    frame.py`` variant)."""
    from ..base import crop_pc_with_img
    raw = np.fromfile(bin_path, dtype=np.float32).reshape(-1, 4)
    pc_cam = raw[:, :3] @ Pc[:3, :3].T + Pc[:3, 3]
    pc_cam, (inten,) = crop_pc_with_img(pc_cam, [raw[:, 3:4]], img_shape, K)
    from .. import native
    pc_d, inten_d = native.voxel_downsample(pc_cam, voxel, inten)
    sn = estimate_normals(pc_d, k=normal_k)
    out = np.concatenate([pc_d.T, inten_d.T, sn.T], axis=0).astype(np.float32)
    np.save(out_path, out)
    return out.shape[1]


def accumulate_frames_offline(pc_dir: str, pose_dir: str, out_dir: str, *,
                              frame_num: int = 3, skip: int = 6,
                              voxel: float = 0.4):
    """Offline accumulated-cloud variant
    (``data/kitti/frame_accumulation.py:52-173``): for every frame, fuse
    +-frame_num neighbours at the given stride into its frame and voxel
    downsample, writing ``<out>/<ffffff>.npy`` (7xN)."""
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(pc_dir) if f.endswith(".npy"))
    n = len(files)

    def pose(i):
        return np.load(os.path.join(pose_dir, f"{i:06d}.npz"))["pose"]

    written = 0
    for i in range(n):
        out_path = os.path.join(out_dir, f"{i:06d}.npy")
        if os.path.exists(out_path):
            continue
        P_io = np.linalg.inv(pose(i))
        parts = []
        for j in range(i - frame_num * skip, i + frame_num * skip + 1, skip):
            if j < 0 or j >= n:
                continue
            d = np.load(os.path.join(pc_dir, f"{j:06d}.npy"))
            T = P_io @ pose(j)
            xyz = (T[:3, :3] @ d[:3] + T[:3, 3:4])
            sn = T[:3, :3] @ d[4:7]
            parts.append(np.concatenate([xyz, d[3:4], sn], axis=0))
        acc = np.concatenate(parts, axis=1)
        from .. import native
        pc_d, extra_d = native.voxel_downsample(
            acc[:3].T.astype(np.float32), voxel,
            acc[3:].T.astype(np.float32))
        np.save(out_path, np.concatenate([pc_d.T, extra_d.T],
                                         axis=0).astype(np.float32))
        written += 1
    return written
