"""Orbax checkpointing.

Upgrades the reference's ``torch.save(state_dict)`` per-epoch snapshots
(``models/multimodal_classifier.py:263-265``; no optimizer state, no step,
no mid-epoch resume — ``kitti/train_classifier.py:150-154``) to full
train-state checkpoints: params + BatchNorm stats + Adam moments + step
counter, with atomic writes and retention.
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .engine import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 keep_period: Optional[int] = None):
        """``keep_period``: additionally retain every checkpoint whose step
        is a multiple of it, outside the ``max_to_keep`` window — so
        frequent mid-epoch saves (``--ckpt-every``) cannot evict the
        epoch-boundary history."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 keep_period=keep_period,
                                                 create=True))

    def save(self, state: TrainState, *, metrics: Optional[dict] = None):
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``template`` (an initialised state)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


# -- compact cross-session snapshots ---------------------------------------
#
# The full orbax state (params + BN + Adam moments) is ~3x the params size;
# for carrying a run across VM rebuilds (where only the git repo survives)
# we persist a params+BN+step .npz instead and rebuild the optimizer fresh
# on warm start.  Adam moments re-estimate within ~100 steps; the step
# counter keeps the lr schedule and fresh-scene seeds on track.

def export_npz(state: TrainState, path: str):
    """Write params + batch_stats + step to a single ``.npz``."""
    import numpy as np
    import jax

    arrays = {"__step__": np.asarray(state.step)}
    for name, tree in (("params", state.params),
                       ("batch_stats", state.batch_stats)):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in flat:
            arrays[name + jax.tree_util.keystr(keypath)] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def warm_start_npz(template: TrainState, path: str, tx,
                   partial: bool = False,
                   min_transfer_frac: float = 0.8) -> TrainState:
    """Rebuild a TrainState from :func:`export_npz` output.

    ``template`` supplies the tree structure (from ``Engine.init_state``);
    ``tx`` (the engine's optax transform) initialises fresh Adam moments.

    ``partial=True`` transfers every leaf whose shape matches and keeps
    the template's fresh init for the rest (missing keys or shape
    mismatches) — cross-geometry transfer, e.g. street 96x160 weights
    into the KITTI-shaped 160x512 model, where only the fine head's
    class count (H/32*W/32 cells) differs.  The step counter resets to 0
    in partial mode: the new run's lr schedule must start fresh.

    ``min_transfer_frac`` guards partial mode against silent cold starts:
    if key naming or geometry drifts so that less than this fraction of
    leaves transfers, raise instead of quietly returning a near-fresh
    init (a chip-window-scale run warm-started from nothing).  Pass 0.0
    to explicitly allow any transfer fraction.
    """
    import numpy as np
    import jax

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}

    skipped = []

    def rebuild(name, tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for keypath, leaf in flat:
            key = name + jax.tree_util.keystr(keypath)
            arr = arrays.get(key)
            if arr is None or arr.shape != leaf.shape:
                if not partial:
                    raise ValueError(
                        f"{key}: snapshot "
                        f"{'missing' if arr is None else arr.shape} != "
                        f"template {leaf.shape}")
                skipped.append((key, None if arr is None else arr.shape,
                                leaf.shape))
                leaves.append(leaf)
                continue
            leaves.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = rebuild("params", template.params)
    batch_stats = rebuild("batch_stats", template.batch_stats)
    n_total = (len(jax.tree_util.tree_leaves(template.params))
               + len(jax.tree_util.tree_leaves(template.batch_stats)))
    n_transferred = n_total - len(skipped)
    if skipped:
        print(f"warm_start_npz: kept template init for {len(skipped)} "
              "shape-mismatched/missing leaves:")
        for key, got, want in skipped:
            print(f"  {key}: snapshot {got} != template {want}")
    print(f"warm_start_npz: transferred {n_transferred}/{n_total} leaves "
          f"from {path}")
    if partial and n_total and n_transferred / n_total < min_transfer_frac:
        raise ValueError(
            f"warm_start_npz(partial=True): only {n_transferred}/{n_total} "
            f"leaves matched ({n_transferred / n_total:.0%} < "
            f"{min_transfer_frac:.0%}) — key naming or geometry has "
            "drifted and this would be a near-cold start. Pass "
            "min_transfer_frac=0.0 to override.")
    step = (np.zeros((), "int32") if partial
            else arrays["__step__"].astype("int32"))
    return template.replace(step=step, params=params,
                            batch_stats=batch_stats,
                            opt_state=tx.init(params))
