"""Offline dataset preparation (reference L4': ``data/kitti/*.py``,
``data/oxford/build_dataset.py``, ``data/nuscenes/make_datasets.py``)."""
from .kitti_prep import (estimate_normals, prepare_kitti_velodyne,
                         kitti_png_to_npy, kitti_poses_to_npz)
