"""Checkpoint averaging (SWA) over the retained orbax checkpoints.

The reference saves per-epoch ``state_dict`` snapshots and evaluates the
last one (``kitti/train_classifier.py:150-154``); averaging the tail of
the trajectory (Izmailov et al., SWA) is a train-free quality lever the
e2e ladder (BENCH_NOTES round-3) makes directly measurable: each point of
dump accuracy moves registration success along the cleanup curve.

Averages ``params`` (and, by default, re-estimates BatchNorm statistics
with train-mode forwards on fresh synthetic batches — plain stat
averaging is also available) across all retained steps, then saves a new
checkpoint dir consumable by ``eval.cli dump --checkpoint``.

CPU-safe:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/swa.py \
    --checkpoints-dir /tmp/street_ckpt3 --out /tmp/street_swa \
    --points 4096 --nodes 64 --img-h 96 --img-w 160 --scene street
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--steps", default=None,
                   help="comma-separated steps (default: every retained)")
    p.add_argument("--last", type=int, default=0,
                   help="average only the LAST N retained steps (the SWA "
                        "tail); 0 = all.  keep_period retention also "
                        "keeps old epoch-boundary checkpoints, which "
                        "must not dilute the tail average across lr "
                        "regimes")
    p.add_argument("--points", type=int, default=4096)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--img-h", type=int, default=96)
    p.add_argument("--img-w", type=int, default=160)
    p.add_argument("--scene", default="street")
    p.add_argument("--preset", default="tiny",
                   choices=["tiny", "kitti", "oxford", "nuscenes"])
    p.add_argument("--bn-batches", type=int, default=64,
                   help="train-mode forwards to re-estimate BN stats "
                        "(0 = average the stored stats instead)")
    args = p.parse_args()

    from deepi2p_tpu import config as config_mod
    from deepi2p_tpu.data import SyntheticDataset, BatchLoader
    from deepi2p_tpu.train.engine import Engine
    from deepi2p_tpu.train.checkpoint import CheckpointManager

    maker = {"tiny": config_mod.tiny, "kitti": config_mod.kitti,
             "oxford": config_mod.oxford,
             "nuscenes": config_mod.nuscenes}[args.preset]
    cfg = maker(input_pt_num=args.points, node_a_num=args.nodes,
                node_b_num=args.nodes, k_ab=min(maker().k_ab, args.nodes),
                img_H=args.img_h, img_W=args.img_w,
                synthetic_scene=args.scene)

    ds = SyntheticDataset(cfg, length=cfg.batch_size, seed=11)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=False, num_workers=2)
    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}

    engine = Engine(cfg)
    template = engine.init_state(jax.random.PRNGKey(0), example)

    src = CheckpointManager(args.checkpoints_dir)
    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
    else:
        steps = sorted(src._mgr.all_steps())
        if args.last:
            steps = steps[-args.last:]
    print(f"averaging steps: {steps}")

    acc = None
    last = None
    for s in steps:
        state = src.restore(template, step=s)
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        f32 = jax.tree.map(lambda x: np.asarray(x, np.float64), tree)
        acc = f32 if acc is None else jax.tree.map(np.add, acc, f32)
        last = state
    src.close()
    n = float(len(steps))
    avg = jax.tree.map(lambda x: x / n, acc)
    cast = jax.tree.map(lambda a, t: jnp.asarray(a, t.dtype),
                        avg, {"params": last.params,
                              "batch_stats": last.batch_stats})
    state = last.replace(params=cast["params"],
                         batch_stats=cast["batch_stats"])

    if args.bn_batches:
        # SWA's averaged weights see different pre-activation statistics
        # than any constituent model; re-estimate the running stats by
        # streaming fresh batches through train-mode forwards (EMA with
        # flax's default momentum, warm-started from the averaged stats).
        bn_ds = SyntheticDataset(cfg, length=args.bn_batches * cfg.batch_size,
                                 seed=101, fresh=True)
        bn_loader = BatchLoader(bn_ds, cfg.batch_size, shuffle=False,
                                num_workers=2)
        stats = state.batch_stats
        rng = jax.random.PRNGKey(5)
        fwd = jax.jit(lambda p, st, b, r: engine._forward(p, st, b, True, r)[1])
        for i, b in enumerate(bn_loader):
            rng, sub = jax.random.split(rng)
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            stats = fwd(state.params, stats, batch, sub)
        state = state.replace(batch_stats=stats)
        print(f"BN stats re-estimated on {args.bn_batches} batches")

    dst = CheckpointManager(args.out, max_to_keep=1)
    dst.save(state)
    dst.close()
    # compact committed artifact: the headline table regenerates from this
    # (scripts/repro_headline.py --checkpoint <out>/latest.npz)
    from deepi2p_tpu.train.checkpoint import export_npz
    import os
    export_npz(state, os.path.join(args.out, "latest.npz"))
    print(f"saved SWA({len(steps)}) checkpoint at step {int(state.step)} "
          f"to {args.out} (+ latest.npz)")


if __name__ == "__main__":
    main()
