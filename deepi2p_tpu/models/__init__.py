"""Network definitions (flax.linen), channel-last TPU layout.

Mirrors the reference component set:
  * :mod:`layers`  — PointNet MLP stack & norm/activation zoo
    (``models/layers_pc.py``).
  * :mod:`resnet`  — ResNet-34 feature pyramid (``models/resnet.py``).
  * :mod:`pc_encoder` — SO-Net-style point encoder (``models/networks_pc.py``).
  * :mod:`img_encoder` — image tower (``models/networks_img.py``).
  * :mod:`detector` — attention-fusion classifier
    (``models/networks_united.py``).
"""
from .layers import PointNetMLP, make_activation
from .resnet import ResNetPyramid, resnet34_pyramid
from .pc_encoder import PCEncoder
from .img_encoder import ImageEncoder
from .detector import KeypointDetector
