"""Metrics logging / observability.

Replaces the reference's TensorBoard ``SummaryWriter`` usage
(``kitti/train_classifier.py:21-32``, ``models/multimodal_classifier.py:
280-377``) with a dependency-light JSONL metrics stream plus an optional
TensorBoard sink when the ``tensorboard`` package is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, *, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, tag: str, values: Dict[str, float], step: int):
        rec = {"tag": tag, "step": step, "time": time.time(),
               **{k: float(v) for k, v in values.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in values.items()},
                                 global_step=step)

    def log_image(self, tag: str, image, step: int):
        """image: (H, W, 3) uint8 numpy array."""
        import numpy as np
        img = np.asarray(image)
        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png")
        try:
            import cv2
            cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        except Exception:
            pass
        if self._tb is not None:
            self._tb.add_image(tag, img, global_step=step, dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
