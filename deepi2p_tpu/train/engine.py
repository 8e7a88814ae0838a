"""Jitted training / evaluation engine.

Replaces the stateful ``MMClassifer`` engine
(``models/multimodal_classifier.py:25-377``) with one pure function
``train_step(state, batch, rng) -> (state, metrics)`` compiled once by XLA:

  * GT labels are projected on-device inside the step, exactly like the
    reference does on-GPU (``multimodal_classifier.py:136-177``);
  * Adam(lr, betas=(0.9, 0.999), wd=0) (``multimodal_classifier.py:45-48``)
    with the reference's per-epoch step decay ``lr *= 0.5`` every
    ``lr_decay_step`` epochs, clipped at 1e-5
    (``kitti/train_classifier.py:146-147``,
    ``multimodal_classifier.py:267-277``);
  * BatchNorm statistics ride in ``state.batch_stats`` (flax mutable
    collection) instead of module buffers.

The reference's preallocated-GPU-buffer ``set_input`` H2D staging
(``multimodal_classifier.py:51-58,86-93``) is replaced by device_put of the
batch pytree (see :mod:`deepi2p_tpu.data.prefetch`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.detector import KeypointDetector
from ..ops.projection import generate_labels
from .loss import classification_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """lr * decay^(epoch // decay_step), clipped at ``cfg.lr_clip``."""
    def schedule(step):
        epoch = step // steps_per_epoch
        lr = cfg.lr * cfg.lr_decay_scale ** (epoch // cfg.lr_decay_step)
        return jnp.maximum(lr, cfg.lr_clip)
    return schedule


class Engine:
    """Owns the model definition, optimiser, and jitted step functions."""

    def __init__(self, cfg: Config, steps_per_epoch: int = 1000):
        self.cfg = cfg
        self.model = KeypointDetector(cfg)
        self.schedule = make_lr_schedule(cfg, steps_per_epoch)
        self.tx = optax.adam(self.schedule, b1=0.9, b2=0.999)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._infer = jax.jit(self._infer_impl)
        self._infer_probs = jax.jit(self._infer_probs_impl)
        self._infer_probs_fine = jax.jit(self._infer_probs_fine_impl)

    # -- state ---------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict[str, jax.Array]
                   ) -> TrainState:
        b = example_batch
        # jitted init: eager init dispatches each op separately, which is
        # minutes over a remote relay
        init_fn = jax.jit(lambda r, b: self.model.init(
            r, b["pc"], b["intensity"], b["sn"], b["node_a"], b["node_b"],
            b["img"], train=False))
        variables = init_fn(rng, b)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats,
                          opt_state=self.tx.init(params))

    # -- forward helpers -------------------------------------------------------
    def _forward(self, params, batch_stats, batch, train: bool,
                 dropout_rng: Optional[jax.Array]):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(train=train)
        if train:
            out, updates = self.model.apply(
                variables, batch["pc"], batch["intensity"], batch["sn"],
                batch["node_a"], batch["node_b"], batch["img"],
                mutable=["batch_stats"], rngs={"dropout": dropout_rng},
                **kwargs)
            return out, updates["batch_stats"]
        out = self.model.apply(
            variables, batch["pc"], batch["intensity"], batch["sn"],
            batch["node_a"], batch["node_b"], batch["img"], **kwargs)
        return out, batch_stats

    def _loss_from_out(self, out, batch):
        cfg = self.cfg
        labels = generate_labels(batch["pc"], batch["P"], batch["K"],
                                 cfg.img_H, cfg.img_W,
                                 cfg.img_fine_resolution_scale)
        if cfg.is_fine_resolution:
            coarse_logits, fine_logits = out
        else:
            coarse_logits, fine_logits = out, None
        loss, metrics = classification_loss(
            coarse_logits, fine_logits, labels,
            coarse_loss_alpha=cfg.coarse_loss_alpha,
            inside_weight=cfg.coarse_inside_weight)
        # reference asserts this is zero (multimodal_classifier.py:169-172)
        metrics["fine_violations"] = labels.fine_violations
        return loss, metrics

    # -- steps -----------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, batch, rng):
        def loss_fn(params):
            out, new_stats = self._forward(params, state.batch_stats, batch,
                                           True, rng)
            loss, metrics = self._loss_from_out(out, batch)
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["lr"] = self.schedule(state.step)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, metrics

    def _train_scan_impl(self, state: TrainState, batches, rng):
        """K train steps in ONE dispatch (``lax.scan`` over a stacked
        (K, B, ...) batch pytree).

        Same semantics as K separate :meth:`train_step` calls — the same
        per-step rng splits, BN updates, Adam updates, in the same order —
        but NOT bitwise-identical: XLA fuses/reassociates differently
        inside a scan body, and Adam's normalisation amplifies those
        ulp-level gradient differences to O(lr) per step (advisor round 3).
        The two paths are statistically equivalent training dynamics
        (``test_train_step_scan_matches_loop`` checks the trajectory, not
        bits).  The win: the tunneled relay's fixed per-dispatch latency
        is paid once per K steps instead of per step.  Returns the LAST
        trip's metrics (matching what a per-step loop would log at the
        boundary)."""
        K = jax.tree_util.tree_leaves(batches)[0].shape[0]
        keys = jax.random.split(rng, K)

        def body(carry, xs):
            batch, key = xs
            new_state, metrics = self._train_step_impl(carry, batch, key)
            return new_state, metrics

        state, ms = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree.map(lambda x: x[-1], ms)

    def _eval_step_impl(self, state: TrainState, batch):
        out, _ = self._forward(state.params, state.batch_stats, batch, False,
                               None)
        _, metrics = self._loss_from_out(out, batch)
        return metrics

    def _infer_impl(self, state: TrainState, batch):
        """argmax predictions, mirrors ``inference_pass``
        (``multimodal_classifier.py:100-117``)."""
        out, _ = self._forward(state.params, state.batch_stats, batch, False,
                               None)
        if self.cfg.is_fine_resolution:
            coarse_logits, fine_logits = out
            return (jnp.argmax(coarse_logits, axis=-1),
                    jnp.argmax(fine_logits, axis=-1))
        return jnp.argmax(out, axis=-1)

    def _infer_probs_impl(self, state: TrainState, batch):
        """(p_inside (B,N) f32, fine_pred (B,N) or None): the inside-class
        probability lets the dump stage pick a recall-heavy decision
        threshold — the frustum solver tolerates false positives far
        better than false negatives (round-3 analysis, BENCH_NOTES.md) —
        while argmax reproduces the reference's operating point."""
        out, _ = self._forward(state.params, state.batch_stats, batch, False,
                               None)
        if self.cfg.is_fine_resolution:
            coarse_logits, fine_logits = out
            return (jax.nn.softmax(coarse_logits, axis=-1)[..., 1],
                    jnp.argmax(fine_logits, axis=-1))
        return jax.nn.softmax(out, axis=-1)[..., 1], None

    def _infer_probs_fine_impl(self, state: TrainState, batch):
        """(p_inside (B,N) f32, fine_probs (B,N,C) f32 or None): like
        :meth:`_infer_probs_impl` but with the FULL fine-cell softmax
        instead of its argmax — the subsample-ensemble averages these
        per-point distributions across covers, so the fine decision also
        benefits from the 1/R context-noise reduction (keep-last integer
        cells cannot average; round-5, PnP is fine-accuracy-bound)."""
        out, _ = self._forward(state.params, state.batch_stats, batch, False,
                               None)
        if self.cfg.is_fine_resolution:
            coarse_logits, fine_logits = out
            return (jax.nn.softmax(coarse_logits, axis=-1)[..., 1],
                    jax.nn.softmax(fine_logits, axis=-1))
        return jax.nn.softmax(out, axis=-1)[..., 1], None

    # -- public API --------------------------------------------------------------
    def train_step(self, state, batch, rng):
        state, metrics = self._train_step(state, batch, rng)
        if self.cfg.is_debug:  # loss-dict echo (multimodal_classifier.py:209)
            print({k: float(v) for k, v in metrics.items()})
        return state, metrics

    def train_step_scan(self, state, batches, rng):
        """K steps per dispatch; ``batches`` leaves are (K, B, ...)."""
        return self._train_scan(state, batches, rng)

    def eval_step(self, state, batch):
        return self._eval_step(state, batch)

    def infer(self, state, batch):
        return self._infer(state, batch)

    def infer_probs(self, state, batch):
        return self._infer_probs(state, batch)

    def infer_probs_fine(self, state, batch):
        return self._infer_probs_fine(state, batch)
