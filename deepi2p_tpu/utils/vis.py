"""Visualization helpers (reference ``util/vis_tools.py``).

Covers the reference's visual diagnostics with cv2/matplotlib:
  * ``plot_pc`` — 3D scatter (``vis_tools.py:25-58``);
  * ``fig_to_np`` / ``grid`` — figure capture & tiling (``:61-93``);
  * ``classification_overlay`` — project points onto an enlarged image
    canvas colored TP green / wrong-fine yellow / FN red / FP blue with the
    fine-resolution grid drawn (``:147-339``);
  * ``registration_overlay`` — project the cloud through an estimated pose
    (``:96-145``).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

# BGR-free: all colors are RGB tuples.
GREEN = (0, 255, 0)      # correct coarse + correct fine (TP)
YELLOW = (255, 255, 0)   # correct coarse, wrong fine
RED = (255, 0, 0)        # false negative (inside labelled, predicted out)
BLUE = (0, 0, 255)       # false positive (outside labelled, predicted in)


def plot_pc(pc: np.ndarray, color=None, size: float = 1.0, ax=None):
    """Scatter a (N, 3) cloud in 3D; returns the axis."""
    import matplotlib.pyplot as plt
    if ax is None:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
    ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], c=color, s=size, cmap="jet")
    return ax


def fig_to_np(fig) -> np.ndarray:
    """Render a matplotlib figure to an (H, W, 3) uint8 array."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[:, :, :3].copy()


def grid(images: List[np.ndarray], cols: int = 2) -> np.ndarray:
    """Tile same-sized images row-major into one canvas."""
    if not images:
        return np.zeros((1, 1, 3), np.uint8)
    h, w = images[0].shape[:2]
    rows = (len(images) + cols - 1) // cols
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, img in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = img[:h, :w]
    return canvas


def classification_overlay(pxpy: np.ndarray,
                           coarse_pred: np.ndarray, coarse_label: np.ndarray,
                           img: np.ndarray,
                           fine_pred: Optional[np.ndarray] = None,
                           fine_label: Optional[np.ndarray] = None,
                           fine_scale: int = 32, pad: int = 100,
                           radius: int = 1) -> np.ndarray:
    """Draw per-point classification quality on an enlarged image canvas.

    Args:
      pxpy: (N, 2) projected pixel coordinates (full resolution);
      img: (H, W, 3) uint8/float image.
    """
    import cv2
    H, W = img.shape[:2]
    canvas = np.zeros((H + 2 * pad, W + 2 * pad, 3), np.uint8)
    canvas[pad:pad + H, pad:pad + W] = img.astype(np.uint8)
    # fine grid lines over the original image area
    for gx in range(0, W + 1, fine_scale):
        cv2.line(canvas, (pad + gx, pad), (pad + gx, pad + H), (64, 64, 64), 1)
    for gy in range(0, H + 1, fine_scale):
        cv2.line(canvas, (pad, pad + gy), (pad + W, pad + gy), (64, 64, 64), 1)

    for i in range(pxpy.shape[0]):
        x = int(round(pxpy[i, 0])) + pad
        y = int(round(pxpy[i, 1])) + pad
        if not (0 <= x < canvas.shape[1] and 0 <= y < canvas.shape[0]):
            continue
        lab, pred = int(coarse_label[i]), int(coarse_pred[i])
        if lab == 1 and pred == 1:
            color = GREEN
            if fine_pred is not None and fine_label is not None \
                    and int(fine_pred[i]) != int(fine_label[i]):
                color = YELLOW
        elif lab == 1 and pred == 0:
            color = RED
        elif lab == 0 and pred == 1:
            color = BLUE
        else:
            continue
        cv2.circle(canvas, (x, y), radius, color, -1)
    return canvas


def registration_overlay(pc: np.ndarray, P: np.ndarray, K: np.ndarray,
                         pred_inside: np.ndarray, img: np.ndarray,
                         radius: int = 1) -> np.ndarray:
    """Project the cloud through an estimated pose and mark predicted-inside
    points on the image (``vis_tools.py:96-145``)."""
    import cv2
    out = img.astype(np.uint8).copy()
    H, W = out.shape[:2]
    cam = pc @ P[:3, :3].T + P[:3, 3]
    front = cam[:, 2] > 0.1
    px = K[0, 0] * cam[:, 0] / np.maximum(cam[:, 2], 1e-6) + K[0, 2]
    py = K[1, 1] * cam[:, 1] / np.maximum(cam[:, 2], 1e-6) + K[1, 2]
    for i in np.nonzero(front & (pred_inside > 0))[0]:
        x, y = int(round(px[i])), int(round(py[i]))
        if 0 <= x < W and 0 <= y < H:
            cv2.circle(out, (x, y), radius, RED, -1)
    return out
