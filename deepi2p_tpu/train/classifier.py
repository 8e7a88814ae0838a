"""Object-style facade over the functional engine.

Mirrors the public API of the reference's engine classes ``MMClassifer`` /
``MMClassiferCoarse`` (``models/multimodal_classifier.py:25-377,380-682``)
— ``set_input`` / ``optimize`` / ``test_model`` / ``inference_pass`` /
``save_network`` / ``load_model`` / ``update_learning_rate`` /
``write_*`` — so reference users find the surface they know, implemented on
the jitted :class:`deepi2p_tpu.train.Engine`.  The coarse-only variant is
``cfg.is_fine_resolution=False`` instead of a second 300-line class.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from .engine import Engine, TrainState
from .checkpoint import CheckpointManager
from ..utils.logging import MetricsLogger


class MMClassifier:
    """Stateful wrapper: owns the train state, rng, metrics, checkpoints."""

    def __init__(self, cfg: Config, *, steps_per_epoch: int = 1000,
                 log_dir: Optional[str] = None, seed: int = 0):
        self.cfg = cfg
        self.engine = Engine(cfg, steps_per_epoch=steps_per_epoch)
        self.logger = MetricsLogger(log_dir) if log_dir else None
        self._rng = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self._batch: Optional[Dict] = None
        self.train_metrics: Dict[str, float] = {}
        self.test_metrics: Dict[str, float] = {}

    # -- reference API ------------------------------------------------------
    @property
    def global_step(self) -> int:
        return 0 if self.state is None else int(self.state.step)

    def set_input(self, batch: Dict[str, np.ndarray]):
        """Stage a batch on device (replaces the preallocated-buffer H2D
        copies, ``multimodal_classifier.py:82-93``)."""
        self._batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.state is None:
            self._rng, sub = jax.random.split(self._rng)
            self.state = self.engine.init_state(sub, self._batch)

    def optimize(self):
        """One training step on the staged batch
        (``multimodal_classifier.py:214-219``)."""
        self._rng, sub = jax.random.split(self._rng)
        self.state, metrics = self.engine.train_step(self.state, self._batch,
                                                     sub)
        self.train_metrics = {k: float(v) for k, v in metrics.items()}
        if self.logger:
            self.logger.log_scalars("train", self.train_metrics,
                                    self.global_step)
        return self.train_metrics

    def test_model(self):
        """Evaluation pass on the staged batch (no parameter update)."""
        metrics = self.engine.eval_step(self.state, self._batch)
        self.test_metrics = {k: float(v) for k, v in metrics.items()}
        if self.logger:
            self.logger.log_scalars("test", self.test_metrics,
                                    self.global_step)
        return self.test_metrics

    def inference_pass(self):
        """argmax coarse (+fine) predictions
        (``multimodal_classifier.py:100-117``)."""
        return self.engine.infer(self.state, self._batch)

    def get_current_errors(self):
        return self.train_metrics, self.test_metrics

    def get_current_accuracy(self):
        pick = lambda d: {k: v for k, v in d.items() if "accuracy" in k}
        return pick(self.train_metrics), pick(self.test_metrics)

    def save_network(self, directory: str):
        """Full-state checkpoint (upgrade over the reference's weights-only
        ``torch.save``)."""
        mgr = CheckpointManager(directory)
        mgr.save(self.state)
        mgr.close()

    def load_model(self, directory: str, step: Optional[int] = None):
        assert self.state is not None, "call set_input once to build state"
        mgr = CheckpointManager(directory)
        self.state = mgr.restore(self.state, step)
        mgr.close()

    def load_torch_checkpoint(self, state_dict):
        """Import a reference-trained torch checkpoint
        (``util/pytorch_helper.py`` counterpart)."""
        from ..models.torch_import import load_torch_detector
        params, stats = load_torch_detector(state_dict)
        self.state = self.state.replace(
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, stats))

    @staticmethod
    def print_loss_dict(loss_dict, accuracy_dict=None, duration=-1.0):
        """Console formatting parity (``multimodal_classifier.py:253-261``)."""
        parts = [f"Per sample time: {duration:.4f} -"]
        parts += [f"{k}: {v:.4f}," for k, v in loss_dict.items()]
        if accuracy_dict:
            parts += [f"{k}: {v:.4f}," for k, v in accuracy_dict.items()]
        print(" ".join(parts))

    # lr control lives in the optax schedule; exposed for API parity
    def update_learning_rate(self, ratio: float):  # noqa: ARG002
        """No-op: the step-decay schedule (``make_lr_schedule``) already
        applies lr x0.5 every ``lr_decay_step`` epochs with the 1e-5 clip
        (``multimodal_classifier.py:267-277``)."""
        return float(self.engine.schedule(self.state.step))

    # -- visualization (write_* of the reference) ---------------------------
    def write_classification_visualization(self, out_step: Optional[int] = None):
        """Project the staged batch's cloud and log the TP/FP/FN overlay
        (``multimodal_classifier.py:338-377``)."""
        from ..ops.projection import generate_labels
        from ..utils.vis import classification_overlay, grid
        if self.logger is None:
            return None
        preds = self.inference_pass()
        coarse_pred, fine_pred = (preds if self.cfg.is_fine_resolution
                                  else (preds, None))
        labels = generate_labels(self._batch["pc"], self._batch["P"],
                                 self._batch["K"], self.cfg.img_H,
                                 self.cfg.img_W,
                                 self.cfg.img_fine_resolution_scale)
        imgs = []
        n = min(self.cfg.vis_max_batch, self._batch["img"].shape[0])
        for b in range(n):
            imgs.append(classification_overlay(
                np.asarray(labels.pxpy[b]),
                np.asarray(coarse_pred[b]), np.asarray(labels.coarse[b]),
                np.asarray(self._batch["img"][b]),
                fine_pred=None if fine_pred is None else np.asarray(fine_pred[b]),
                fine_label=np.asarray(labels.fine[b]),
                fine_scale=self.cfg.img_fine_resolution_scale))
        canvas = grid(imgs, cols=2)
        self.logger.log_image("classification", canvas,
                              out_step if out_step is not None
                              else self.global_step)
        return canvas
