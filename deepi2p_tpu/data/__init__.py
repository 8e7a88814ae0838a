"""Data pipeline (L4): dataset loaders, augmentation, host->device prefetch.

The reference's torch ``Dataset`` subclasses
(``data/{kitti,oxford,nuscenes}_pc_img_pose_loader.py``) are replaced by
numpy-based samplers feeding fixed-shape device batches; Open3D voxel
downsampling is re-implemented in numpy
(:func:`deepi2p_tpu.ops.voxel_downsample_np`).
"""
from .synthetic import synthetic_batch, SyntheticDataset
from .base import collate, scale_K, crop_K
from .prefetch import BatchLoader, device_prefetch
from .oxford import OxfordLoader
from .kitti import KittiLoader, KittiCalib
from .nuscenes import NuScenesLoader, enu2cam
