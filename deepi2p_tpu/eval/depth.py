"""Depth-map -> pseudo point cloud dump for the ICP pipeline.

Replaces ``evaluation/icp/save_depth_map.py``: the reference runs an
external monodepth2 network (not vendored there either, ``save_depth_map.py``
imports an out-of-repo ``networks`` package) to get a depth map, converts it
to a camera-frame pseudo point cloud and saves ``{prefix}_pc.npy`` next to
the classification dumps, which ``registration_icp.py`` then consumes.

Here any depth source works: pass a ``depth_fn(image_hw3) -> depth_hw``
callable (a monodepth model, a stereo matcher, ...).  The conversion itself
(``K^-1 [u,v,1] * depth``) is :func:`deepi2p_tpu.register.icp.
depth_to_pointcloud` and runs on-device.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable

import numpy as np
import jax.numpy as jnp

from ..register.icp import depth_to_pointcloud


def dump_pseudo_pointclouds(image_dir_or_items: Iterable, K: np.ndarray,
                            depth_fn: Callable[[np.ndarray], np.ndarray],
                            out_dir: str, *, stride: int = 4,
                            max_depth: float = 0.0):
    """For each (prefix, image) item write ``{prefix}_pc.npy`` (3, M).

    Args:
      image_dir_or_items: iterable of (prefix, image (H, W, 3)) pairs.
      K: (3, 3) intrinsics of the images.
      depth_fn: any depth estimator.
      max_depth: if > 0, drop pixels whose estimated depth is >= this —
        a depth net trained on dense ray-cast targets saturates
        scene-exit rays at the far cap (``data.synthetic.
        raycast_street_depth``), and those "sky" pixels must not feed
        the ICP target cloud (they sit past every real surface).
    """
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for prefix, img in image_dir_or_items:
        depth = np.asarray(depth_fn(img), np.float32)
        pc = np.asarray(depth_to_pointcloud(jnp.asarray(depth),
                                            jnp.asarray(K), stride=stride))
        if max_depth > 0:
            pc = pc[pc[:, 2] < max_depth]
        np.save(os.path.join(out_dir, f"{prefix}_pc.npy"),
                pc.T.astype(np.float32))   # (3, M) like the reference
        n += 1
    return n
