"""TPU-native numerical core.

Replaces the reference's L0/L1 layers — the CUDA ``index_max`` extension
(``models/index_max_ext/``), the brute-force kNN/topk helpers
(``util/som.py``, ``models/operations.py``) and the projection / label math
that lives inside the train step (``models/multimodal_classifier.py:136-177``)
— with dense XLA ops laid out for the MXU/VPU.

Conventions (differ from the torch reference deliberately):
  * points are ``(B, N, 3)`` and features ``(B, N, C)`` — channel-last so the
    channel axis maps to TPU lanes and 1x1 convs become MXU matmuls.
"""
from .knn import pairwise_dist2, knn, gather_knn
from .segment import node_pool_max, node_mean_and_count, scatter_to_points
from .interpolate import interpolate_inverse_dist
from .projection import project_points, coarse_labels, fine_labels, generate_labels
from .sampling import farthest_point_sample_np, farthest_point_sample, voxel_downsample_np, random_resample_np
