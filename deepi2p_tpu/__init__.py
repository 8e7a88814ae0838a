"""DeepI2P-TPU: a TPU-native (JAX/XLA/Pallas/pjit) cross-modality
image-to-point-cloud registration framework.

Re-designed from scratch with the capabilities of lijx10/DeepI2P
(CVPR 2021): per-point frustum classification (coarse inside/outside +
fine grid cell) with a two-tower point-cloud/image fusion network, followed
by classical pose optimisation (inverse camera projection via batched
Levenberg-Marquardt, PnP, ICP) — all batched on-device.
"""

__version__ = "0.1.0"

from . import config
