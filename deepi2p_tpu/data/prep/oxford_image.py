"""First-principles Oxford RobotCar image decoding.

The reference delegates image decode to the external robotcar-dataset-sdk
(``/root/reference/data/oxford/build_dataset.py:356-378`` calls the SDK's
``load_image(path, model)``), which (a) Bayer-demosaics the raw single-
channel PNG and (b) undistorts it through the camera-model's bilinear
look-up table.  Both stages are implemented here from first principles so
the only remaining external inputs are *files*: the raw PNGs and the
``<camera>_distortion_lut_<size>.bin`` LUT shipped with the SDK's
camera-models directory.

- :func:`demosaic` — bilinear demosaicing for any 2x2 Bayer pattern via
  mask-normalised convolution (known samples preserved exactly; missing
  samples are the bilinear average of their available neighbours — the
  same interpolation the SDK's ``demosaic(..., 'bilinear')`` performs).
  Oxford's Bumblebee stereo camera uses 'gbrg'; the monos use 'rggb'.
- :func:`read_distortion_lut` — parses the SDK LUT binary: flat float64,
  reshaped (2, H*W), row 0 = undistorted-source x (u), row 1 = y (v) per
  output pixel.
- :func:`undistort` — bilinear resampling of each channel at the LUT
  coordinates (the SDK uses ``scipy.ndimage.map_coordinates(order=1)``;
  ``cv2.remap(INTER_LINEAR, BORDER_CONSTANT)`` is the same arithmetic).
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np

BAYER_STEREO = "gbrg"
BAYER_MONO = "rggb"


def demosaic(raw: np.ndarray, pattern: str = BAYER_STEREO) -> np.ndarray:
    """raw (H, W) uint8/uint16 Bayer mosaic -> RGB float32 (H, W, 3).

    ``pattern`` gives the 2x2 tile reading order 'top-left top-right /
    bottom-left bottom-right', e.g. 'gbrg' =  G B / R G.
    """
    import cv2

    p = pattern.lower()
    if len(p) != 4 or set(p) - set("rgb"):
        raise ValueError(f"bad Bayer pattern {pattern!r}")
    raw_f = raw.astype(np.float32)
    H, W = raw_f.shape
    masks = np.zeros((3, H, W), np.float32)
    for idx, ch in enumerate(p):
        r, c = divmod(idx, 2)
        masks["rgb".index(ch)][r::2, c::2] = 1.0
    # Bilinear kernel: at a missing pixel the numerator collects the
    # available neighbours (4-neighbours weight 2, diagonals weight 1) and
    # the denominator their total weight; the sparse-mask zeros make each
    # ratio exactly the bilinear average of whichever neighbours carry
    # that colour.  Known samples are then restored verbatim.
    k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32)
    out = np.empty((H, W, 3), np.float32)
    for ci in range(3):
        num = cv2.filter2D(raw_f * masks[ci], -1, k,
                           borderType=cv2.BORDER_REFLECT)
        den = cv2.filter2D(masks[ci], -1, k,
                           borderType=cv2.BORDER_REFLECT)
        interp = num / np.maximum(den, 1e-6)
        out[..., ci] = np.where(masks[ci] > 0, raw_f, interp)
    return out


def read_distortion_lut(path: str, shape: Tuple[int, int]
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """SDK LUT binary -> (map_u (H, W), map_v (H, W)) float32 source
    coordinates per output pixel."""
    H, W = shape
    lut = np.fromfile(path, np.double)
    if lut.size != 2 * H * W:
        raise ValueError(
            f"LUT {path} has {lut.size} entries, expected 2*{H}*{W}")
    lut = lut.reshape(2, H * W)
    return (lut[0].reshape(H, W).astype(np.float32),
            lut[1].reshape(H, W).astype(np.float32))


def undistort(img: np.ndarray, map_u: np.ndarray,
              map_v: np.ndarray) -> np.ndarray:
    """Bilinear per-channel resample at the LUT coordinates (out-of-range
    source coords produce 0, matching map_coordinates' constant mode)."""
    import cv2

    src = img.astype(np.float32)
    return cv2.remap(src, map_u, map_v, interpolation=cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def make_load_image(lut_path: Optional[str] = None,
                    pattern: str = BAYER_STEREO
                    ) -> Callable[[str], np.ndarray]:
    """Compose raw-PNG read + demosaic + (optional) LUT undistortion into
    the ``load_image(path) -> RGB uint8 (H, W, 3)`` contract of
    :class:`~deepi2p_tpu.data.prep.oxford_prep.SdkInterface`.

    The LUT is parsed lazily on the first image (its shape fixes H, W) and
    cached; with ``lut_path=None`` the decode is demosaic-only.
    """
    import cv2

    cache: dict = {}

    def load_image(path: str) -> np.ndarray:
        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if raw is None:
            raise FileNotFoundError(path)
        if raw.ndim == 3:          # already-decoded image: pass through
            return cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        rgb = demosaic(raw, pattern)
        if lut_path is not None:
            if "lut" not in cache:
                cache["lut"] = read_distortion_lut(lut_path, raw.shape)
            rgb = undistort(rgb, *cache["lut"])
        return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)

    return load_image
