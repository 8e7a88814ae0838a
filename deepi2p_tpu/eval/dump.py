"""Inference dump in the reference's npy contract.

Reproduces ``evaluation/visualize_and_save_data.py:94-186``: for each
evaluation sample, run the classifier, recompute the GT labels, and save

    {prefix}_pc_label.npy   — (7, N): xyz, coarse_pred, coarse_label,
                                       fine_pred, fine_label
    {prefix}_K.npy          — (3, 3)
    {prefix}_P.npy          — (3, 4) ground-truth pose

This triplet is the handoff format consumed by every registration solver
(``evaluation/registration_lsq.py:291-298``), so dumps produced by the
reference network can drive the TPU solvers directly and vice versa.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np
import jax.numpy as jnp

from ..config import Config
from ..ops.projection import generate_labels


def save_sample_dump(out_dir: str, prefix: str, *, pc: np.ndarray,
                     coarse_pred: np.ndarray, coarse_label: np.ndarray,
                     fine_pred: np.ndarray, fine_label: np.ndarray,
                     K: np.ndarray, P: np.ndarray):
    """pc is (N, 3); stored transposed to match the (7, N) contract."""
    data = np.concatenate([
        pc.T.astype(np.float32),
        coarse_pred[None].astype(np.float32),
        coarse_label[None].astype(np.float32),
        fine_pred[None].astype(np.float32),
        fine_label[None].astype(np.float32),
    ], axis=0)
    np.save(os.path.join(out_dir, prefix + "_pc_label.npy"), data)
    np.save(os.path.join(out_dir, prefix + "_K.npy"), K.astype(np.float32))
    np.save(os.path.join(out_dir, prefix + "_P.npy"), P.astype(np.float32))


def load_dump(data_dir: str, prefix: str):
    """-> dict(pc (N,3), coarse_pred, coarse_label, fine_pred, fine_label,
    K (3,3), P (4,4))."""
    d = np.load(os.path.join(data_dir, prefix + "_pc_label.npy"))
    K = np.load(os.path.join(data_dir, prefix + "_K.npy"))
    P = np.load(os.path.join(data_dir, prefix + "_P.npy"))
    if P.shape[0] == 3:
        P = np.concatenate([P, np.eye(4)[3:4]], axis=0)
    out = dict(pc=d[0:3].T, coarse_pred=d[3].astype(np.int32),
               coarse_label=d[4].astype(np.int32),
               fine_pred=d[5].astype(np.int32),
               fine_label=d[6].astype(np.int32),
               K=K.astype(np.float64), P=P.astype(np.float64))
    # optional per-point inside probability (written with --save-probs):
    # lets the solve stage pick its own decision threshold host-side
    p_path = os.path.join(data_dir, prefix + "_p.npy")
    if os.path.isfile(p_path):
        out["p_inside"] = np.load(p_path).astype(np.float32)
    return out


def list_dump_prefixes(data_dir: str):
    names = {f[:9] for f in os.listdir(data_dir)
             if os.path.isfile(os.path.join(data_dir, f))}
    return sorted(names)


class SubsampleEnsemble:
    """Test-time subset-ensemble inference: classify an N-point cloud with
    a network trained at ``sub_n < N`` points.

    Motivation (round-5, measured): the SO-Net encoder's pooling statistics
    depend on points-per-node — evaluating an N=20480 cloud through a model
    trained at N=8192 scores coarse 0.822 raw and only 0.921 after a
    fine-tune AT N=20480 (vs 0.946 at the trained density; BENCH_NOTES
    round-5).  This wrapper splits the cloud into ``ceil(N/sub_n)``
    shuffled subsets of exactly ``sub_n`` points, classifies each at the
    trained density, and averages the inside-probabilities per point
    (points covered twice by the wrap-around pad get the mean).

    ``repeats`` averages over that many INDEPENDENT shuffled covers: each
    point's probability then pools ``repeats`` different subset contexts,
    reducing the per-point variance the random cover induces (a point near
    the frustum boundary can flip with its neighborhood draw).  Cost is
    linear in ``repeats``.  When the engine exposes ``infer_probs_fine``
    (the real :class:`~deepi2p_tpu.train.engine.Engine` does), the fine
    cell decision is the argmax of the cover-averaged PER-CELL softmax —
    the fine head gets the same 1/R context-noise reduction the coarse
    head gets (PnP is fine-accuracy-bound; round-5).  Engines without it
    fall back to keep-last integer cells.

    The reference cannot express this — its eval N always equals the
    training ``input_pt_num`` (``kitti/options.py``); this mode is what
    lets the TPU rebuild serve clouds larger than the trained size without
    retraining.  Exposes ``Engine``'s inference interface
    (:meth:`infer_probs` / :meth:`infer`), so :func:`dump_predictions`
    takes it as a drop-in ``engine``.
    """

    def __init__(self, engine, *, seed: int = 0, repeats: int = 1):
        self.engine = engine
        self.cfg = engine.cfg
        self.repeats = max(1, int(repeats))
        self._rng = np.random.default_rng(seed)

    def infer_probs(self, state, batch):
        """(p_inside (B, N) np.f32, fine_pred (B, N) np.i32 or None)."""
        pc = np.asarray(batch["pc"])
        inten = np.asarray(batch["intensity"])
        sn = np.asarray(batch["sn"])
        B, N = pc.shape[:2]
        sub_n = self.cfg.input_pt_num
        n_sub = -(-N // sub_n)  # ceil
        ma, mb = self.cfg.node_a_num, self.cfg.node_b_num

        p_sum = np.zeros((B, N), np.float64)
        cnt = np.zeros((B, N), np.float64)
        fine = np.zeros((B, N), np.int32)
        fine_sum = None  # (B, N, C) lazily, when the engine yields fine probs
        use_fine_probs = hasattr(self.engine, "infer_probs_fine")
        have_fine = False
        takes = []  # (B, sub_n) subset index blocks, all repeats flattened
        for _r in range(self.repeats):
            # per-sample shuffled cover: a permutation of [0, N) padded
            # with a wrap-around slice to n_sub * sub_n, reshaped to n_sub
            # subsets — every point is covered >= 1x, pad points 2x
            idx = np.stack([self._rng.permutation(N) for _ in range(B)])
            total = n_sub * sub_n
            reps = -(-total // N)  # tile covers sub_n > N too (dup-safe)
            idx = np.tile(idx, (1, reps))[:, :total].reshape(B, n_sub, sub_n)
            takes.extend(idx[:, s] for s in range(n_sub))
        for take in takes:  # (B, sub_n)
            pc_s = np.take_along_axis(pc, take[..., None], axis=1)
            # nodes drawn from the SUBSET: reproduces the trained
            # points-per-node statistics the whole mode exists to restore
            na = self._rng.integers(0, sub_n, (B, ma))
            nb = self._rng.integers(0, sub_n, (B, mb))
            sub = dict(batch)
            sub["pc"] = jnp.asarray(pc_s)
            sub["intensity"] = jnp.asarray(
                np.take_along_axis(inten, take[..., None], axis=1))
            sub["sn"] = jnp.asarray(np.take_along_axis(sn, take[..., None],
                                                       axis=1))
            sub["node_a"] = jnp.asarray(
                np.take_along_axis(pc_s, na[..., None], axis=1))
            sub["node_b"] = jnp.asarray(
                np.take_along_axis(pc_s, nb[..., None], axis=1))
            if use_fine_probs:
                p_s, fine_s = self.engine.infer_probs_fine(state, sub)
            else:
                p_s, fine_s = self.engine.infer_probs(state, sub)
            p_s = np.asarray(p_s, np.float64)
            np.put_along_axis(cnt, take, np.take_along_axis(cnt, take, 1) + 1,
                              axis=1)
            np.put_along_axis(p_sum, take,
                              np.take_along_axis(p_sum, take, 1) + p_s,
                              axis=1)
            if fine_s is not None:
                have_fine = True
                if use_fine_probs:
                    # accumulate the per-cell softmax; within one take the
                    # indices are a permutation chunk (unique), so the
                    # read-modify-write put is exact.  argmax at the end is
                    # invariant to the per-point coverage count (whole
                    # distribution rows accumulate together).
                    fine_p = np.asarray(fine_s, np.float32)
                    if fine_sum is None:
                        fine_sum = np.zeros((B, N, fine_p.shape[-1]),
                                            np.float32)
                    idx3 = take[..., None]
                    np.put_along_axis(
                        fine_sum, idx3,
                        np.take_along_axis(fine_sum, idx3, axis=1) + fine_p,
                        axis=1)
                else:
                    np.put_along_axis(fine, take,
                                      np.asarray(fine_s, np.int32), axis=1)
        p = (p_sum / np.maximum(cnt, 1.0)).astype(np.float32)
        if have_fine and fine_sum is not None:
            fine = np.argmax(fine_sum, axis=-1).astype(np.int32)
        return p, (fine if have_fine else None)

    def infer(self, state, batch):
        """Argmax analogue: threshold the ensembled probability at 0.5
        (= per-point binary argmax of the averaged softmax)."""
        p, fine = self.infer_probs(state, batch)
        return (p > 0.5).astype(np.int32), fine


def dump_predictions(engine, state, batches: Iterator[Dict], cfg: Config,
                     out_dir: str, *, max_batches: Optional[int] = None,
                     viz_dir: Optional[str] = None,
                     save_images: bool = False,
                     inside_threshold: Optional[float] = None,
                     save_probs: bool = False):
    """Run inference over ``batches`` and write per-sample dumps.

    ``viz_dir`` additionally saves the ``{id}_img.png`` input image and the
    ``{id}_prediction.png`` TP/FP/FN overlay like the reference
    (``visualize_and_save_data.py:168-186``).

    ``inside_threshold`` (0..1) replaces the argmax coarse decision with
    ``p_inside > threshold`` — a recall-heavy operating point for the
    frustum solver (false negatives repel the solve; round-3 analysis).
    None reproduces the reference's argmax dump exactly.

    Returns (coarse_accuracy, fine_accuracy) over the dumped set
    (``visualize_and_save_data.py:141-148,216-217``).
    """
    os.makedirs(out_dir, exist_ok=True)
    if viz_dir:
        os.makedirs(viz_dir, exist_ok=True)
    n_total = n_coarse_ok = 0
    n_inside = n_fine_ok = 0
    idx = 0
    for bi, batch in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        p_inside = None
        if inside_threshold is not None or save_probs:
            p_inside, fine_pred = engine.infer_probs(state, jbatch)
            p_inside = np.asarray(p_inside)
        if inside_threshold is not None:
            coarse_pred = (p_inside > inside_threshold).astype(np.int32)
        elif p_inside is not None:
            # binary argmax == p_inside > 0.5; reusing the probs avoids a
            # second full forward (2x the whole ensemble for
            # SubsampleEnsemble engines)
            coarse_pred = (p_inside > 0.5).astype(np.int32)
        else:
            coarse_pred, fine_pred = engine.infer(state, jbatch)
        labels = generate_labels(jbatch["pc"], jbatch["P"], jbatch["K"],
                                 cfg.img_H, cfg.img_W,
                                 cfg.img_fine_resolution_scale)
        coarse_pred = np.asarray(coarse_pred)
        fine_pred = np.asarray(fine_pred)
        coarse_lab = np.asarray(labels.coarse)
        fine_lab = np.asarray(labels.fine)
        B, N = coarse_pred.shape
        n_total += B * N
        n_coarse_ok += int((coarse_pred == coarse_lab).sum())
        inside = coarse_lab == 1
        n_inside += int(inside.sum())
        n_fine_ok += int(((fine_pred == fine_lab) & inside).sum())
        for b in range(B):
            prefix = f"{idx:06d}_00"
            save_sample_dump(out_dir, prefix,
                             pc=np.asarray(batch["pc"][b]),
                             coarse_pred=coarse_pred[b],
                             coarse_label=coarse_lab[b],
                             fine_pred=fine_pred[b],
                             fine_label=fine_lab[b],
                             K=np.asarray(batch["K"][b]),
                             P=np.asarray(batch["P"][b]))
            if save_probs:
                # p_inside per point: lets threshold sweeps re-derive
                # coarse_pred host-side without re-running the network
                np.save(os.path.join(out_dir, prefix + "_p.npy"),
                        p_inside[b].astype(np.float32))
            if save_images:
                # input image alongside the dump: lets a depth estimator
                # (eval.cli depth-dump) run from the dump directory alone,
                # like the reference's save_depth_map.py reads the eval
                # split's images
                np.save(os.path.join(out_dir, prefix + "_img.npy"),
                        np.asarray(batch["img"][b], np.float32))
            if viz_dir:
                import cv2
                from ..utils.vis import classification_overlay
                img = np.asarray(batch["img"][b]).astype(np.uint8)
                cv2.imwrite(os.path.join(viz_dir, prefix + "_img.png"),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
                overlay = classification_overlay(
                    np.asarray(labels.pxpy[b]), coarse_pred[b],
                    coarse_lab[b], img, fine_pred=fine_pred[b],
                    fine_label=fine_lab[b],
                    fine_scale=cfg.img_fine_resolution_scale)
                cv2.imwrite(os.path.join(viz_dir, prefix + "_prediction.png"),
                            cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
            idx += 1
    coarse_acc = n_coarse_ok / max(n_total, 1)
    fine_acc = n_fine_ok / max(n_inside, 1)
    return coarse_acc, fine_acc
