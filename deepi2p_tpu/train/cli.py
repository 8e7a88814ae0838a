"""Training entry point.

Replaces the three near-identical per-dataset scripts
(``kitti/train_classifier.py``, ``oxford/train_classifier.py``,
``nuscenes_t/train_classifier.py``) with one argparse CLI:

    python -m deepi2p_tpu.train.cli --dataset oxford --dataroot /data/oxford

Epoch loop parity (``kitti/train_classifier.py:54-154``): per-epoch
validation on the held-out split, lr x0.5 every ``lr_decay_step`` epochs
(handled inside the optax schedule), per-epoch checkpoints (with optimizer
state + step — an upgrade over the reference's weights-only saves), periodic
scalar/image logging.
"""
from __future__ import annotations

import argparse
import time

import jax

from .. import config as config_mod
from ..data import BatchLoader, device_prefetch, SyntheticDataset
from ..parallel import make_mesh, ShardedEngine
from .checkpoint import CheckpointManager
from ..utils.logging import MetricsLogger


def _stacked(batch_iter, k: int):
    """Group k consecutive (B, ...) batches into one (k, B, ...) stack
    (host-side, for scan dispatch); a ragged tail of <k is dropped."""
    import numpy as np
    while True:
        group = []
        for b in batch_iter:
            group.append(b)
            if len(group) == k:
                break
        if len(group) < k:
            return
        yield {key: np.stack([g[key] for g in group]) for key in group[0]}


def build_loaders(cfg, args):
    if args.dataset == "synthetic":
        train = SyntheticDataset(cfg, length=args.synthetic_len, seed=0,
                                 fresh=args.fresh_scenes)
        val_len = args.val_len or max(args.synthetic_len // 4, 1)
        val = SyntheticDataset(cfg, length=val_len, seed=1)
        return train, val
    if args.dataset == "oxford":
        from ..data import OxfordLoader
        return (OxfordLoader(args.dataroot, "train", cfg),
                OxfordLoader(args.dataroot, "val", cfg))
    if args.dataset == "kitti":
        from ..data import KittiLoader
        return (KittiLoader(args.dataroot, "train", cfg),
                KittiLoader(args.dataroot, "val", cfg))
    if args.dataset == "nuscenes":
        from ..data import NuScenesLoader
        return (NuScenesLoader(args.dataroot, "train", cfg),
                NuScenesLoader(args.dataroot, "val", cfg))
    raise ValueError(args.dataset)


def main(argv=None):
    p = argparse.ArgumentParser(description="DeepI2P-TPU trainer")
    p.add_argument("--dataset", default="synthetic",
                   choices=["oxford", "kitti", "nuscenes", "synthetic"])
    p.add_argument("--dataroot", default="")
    p.add_argument("--checkpoints-dir", default="checkpoints")
    p.add_argument("--log-dir", default="runs")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--coarse-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--synthetic-len", type=int, default=32)
    p.add_argument("--val-len", type=int, default=None,
                   help="synthetic: validation-set size (default len//4); "
                        "long fresh-scene runs shrink it so per-epoch "
                        "validation does not dominate wall time")
    p.add_argument("--fresh-scenes", action="store_true",
                   help="synthetic: a never-seen scene per (epoch, index) "
                        "instead of re-iterating a finite set")
    p.add_argument("--synthetic-scene", default=None,
                   choices=["uniform", "street"],
                   help="synthetic cloud structure (see config.py)")
    p.add_argument("--synthetic-preset", default="tiny",
                   choices=["tiny", "kitti", "oxford", "nuscenes"],
                   help="config preset for --dataset synthetic: exercises "
                        "that dataset's image/label geometry (kitti "
                        "160x512 y-rotation, nuscenes 160x320 z-rotation "
                        "ENU frame) on synthetic scenes")
    p.add_argument("--points", type=int, default=None,
                   help="override cfg.input_pt_num (synthetic experiments)")
    p.add_argument("--nodes", type=int, default=None,
                   help="override node_a_num/node_b_num")
    p.add_argument("--img-h", type=int, default=None,
                   help="override cfg.img_H (synthetic experiments)")
    p.add_argument("--img-w", type=int, default=None,
                   help="override cfg.img_W (synthetic experiments)")
    p.add_argument("--lr-decay-step", type=int, default=None)
    p.add_argument("--inside-weight", type=float, default=None,
                   help="up-weight the inside-frustum coarse class in the "
                        "focal loss (cfg.coarse_inside_weight)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="also checkpoint every N steps (0 = per-epoch "
                        "only); resume restarts the interrupted epoch "
                        "from its beginning with the restored state")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="run K train steps per device dispatch via "
                        "lax.scan over K host-stacked batches: same rng/"
                        "BN/Adam sequencing as K separate steps (equal up "
                        "to XLA fusion reassociation, which Adam amplifies "
                        "to O(lr) per step — statistically equivalent, "
                        "not bitwise), but the tunneled relay's fixed "
                        "per-dispatch latency is paid once per K steps "
                        "(ragged epoch tails of <K batches are dropped "
                        "and the lr schedule accounts for it)")
    p.add_argument("--device-data", action="store_true",
                   help="synthetic only: generate batches ON the "
                        "accelerator (data/synthetic_jax.py) instead of "
                        "the host BatchLoader. The numpy generator costs "
                        "~35 ms/sample on this 1-core host — the chip "
                        "idles ~84%% of a street epoch; device-side "
                        "generation makes the step compute-bound and "
                        "removes the host->device image transfer")
    p.add_argument("--warm-start", default="",
                   help="params+BN+step .npz (checkpoint.export_npz) to "
                        "warm-start from when no orbax checkpoint exists "
                        "(fresh Adam moments); used to carry runs across "
                        "VM rebuilds where only the git repo survives")
    p.add_argument("--warm-start-partial", action="store_true",
                   help="transfer only shape-matching leaves from "
                        "--warm-start and keep fresh init for the rest "
                        "(cross-geometry transfer, e.g. a 96x160-trained "
                        "trunk into the 160x512 model whose fine head "
                        "differs); resets step/lr schedule to 0")
    args = p.parse_args(argv)
    if args.warm_start_partial and not args.warm_start:
        p.error("--warm-start-partial requires --warm-start")

    if args.dataset == "synthetic":
        if args.synthetic_preset == "tiny":
            maker = config_mod.tiny
        else:
            base = {"kitti": config_mod.kitti, "oxford": config_mod.oxford,
                    "nuscenes": config_mod.nuscenes}[args.synthetic_preset]
            maker = lambda **kw: base(**kw)  # noqa: E731
    else:
        maker = {"oxford": config_mod.oxford, "kitti": config_mod.kitti,
                 "nuscenes": config_mod.nuscenes}[args.dataset]
    overrides = {"dataroot": args.dataroot,
                 "checkpoints_dir": args.checkpoints_dir}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.coarse_only:
        overrides["is_fine_resolution"] = False
    if args.points:
        overrides["input_pt_num"] = args.points
    if args.nodes:
        overrides["node_a_num"] = args.nodes
        overrides["node_b_num"] = args.nodes
        # kNN over node_b cannot ask for more neighbours than nodes exist
        # (the reference asserts this, models/layers_pc.py:717)
        overrides["k_ab"] = min(maker().k_ab, args.nodes)
    if args.synthetic_scene:
        overrides["synthetic_scene"] = args.synthetic_scene
    if args.img_h:
        overrides["img_H"] = args.img_h
    if args.img_w:
        overrides["img_W"] = args.img_w
    if args.lr_decay_step:
        overrides["lr_decay_step"] = args.lr_decay_step
    if args.inside_weight:
        overrides["coarse_inside_weight"] = args.inside_weight
    cfg = maker(**overrides)
    epochs = args.epochs if args.epochs is not None else cfg.epochs

    train_ds, val_ds = build_loaders(cfg, args)
    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    K = max(args.steps_per_dispatch, 1)
    if K > 1 and steps_per_epoch % K:
        # _stacked drops ragged tails of <K batches; round the schedule's
        # steps_per_epoch down to match so lr-decay boundaries and the
        # resume epoch accounting track the steps that actually run
        dropped = steps_per_epoch % K
        steps_per_epoch -= dropped
        print(f"steps-per-dispatch {K}: epoch rounded to {steps_per_epoch} "
              f"steps ({dropped} ragged batches/epoch dropped)")

    # the data axis must divide the batch; drop devices if batch is tiny
    import math
    n_dev = len(jax.devices())
    n_data = math.gcd(cfg.batch_size, max(n_dev // args.mesh_model, 1))
    devices = jax.devices()[:n_data * args.mesh_model]
    mesh = make_mesh(n_model=args.mesh_model, devices=devices)
    engine = ShardedEngine(cfg, mesh, steps_per_epoch=steps_per_epoch)
    logger = MetricsLogger(args.log_dir)
    # keep_period: mid-epoch --ckpt-every saves must not evict epoch-
    # boundary checkpoints (max_to_keep=5 alone cycles in ~1500 steps)
    ckpt = CheckpointManager(cfg.checkpoints_dir,
                             keep_period=10 * steps_per_epoch)
    import os
    from .checkpoint import export_npz
    npz_path = os.path.join(cfg.checkpoints_dir, "latest.npz")

    example = BatchLoader(train_ds, cfg.batch_size,
                          num_workers=1, seed=0).__iter__().__next__()
    state = engine.init_state(jax.random.PRNGKey(args.seed), example)
    start_epoch = 0
    from ..parallel import shard_state

    def _floor_to_epoch(state, what):
        """Mid-epoch restores restart the interrupted epoch from its
        beginning; floor ``state.step`` to the epoch boundary so the lr
        schedule's ``step // steps_per_epoch`` and the ``--epochs`` total
        budget stay aligned with the loop epoch across kill+resume cycles."""
        import jax.numpy as jnp
        step0 = int(state.step)
        epoch = step0 // steps_per_epoch
        floored = epoch * steps_per_epoch
        if floored != step0:
            state = state.replace(step=jnp.asarray(floored, jnp.int32))
        print(f"{what} at step {step0} (epoch {epoch}"
              + (f"; step floored to {floored}" if floored != step0 else "")
              + ")")
        return state, epoch

    if args.warm_start and args.resume and ckpt.latest_step() is not None:
        print(f"warm-start SKIPPED: --resume found orbax checkpoint at step "
              f"{ckpt.latest_step()} in {cfg.checkpoints_dir}, which wins "
              f"over --warm-start {args.warm_start}")
    if args.warm_start and not (args.resume and ckpt.latest_step() is not None):
        from .checkpoint import warm_start_npz
        state = warm_start_npz(state, args.warm_start, engine.tx,
                               partial=args.warm_start_partial)
        # re-place with the mesh layout init_state established (bare
        # device_put would silently drop the TP sharding of wide kernels)
        state = shard_state(engine.mesh, state)
        state, start_epoch = _floor_to_epoch(
            state, f"warm-started from {args.warm_start}")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        state = shard_state(engine.mesh, state)
        # continue the epoch count (epochs is the TOTAL budget, not an
        # increment): fresh-scene seeds, val cadence and the log all pick
        # up where the interrupted run stopped
        state, start_epoch = _floor_to_epoch(state, "resumed")

    rng = jax.random.PRNGKey(args.seed + 1)
    # host-side mirror of state.step: fetching int(state.step) every
    # iteration is a blocking device sync (hundreds of ms over the TPU
    # relay) that serializes dispatch; sync only at log/ckpt boundaries
    step = int(state.step)
    last_ckpt = last_log = step
    if args.device_data and args.dataset != "synthetic":
        raise SystemExit("--device-data requires --dataset synthetic")
    if args.device_data:
        from ..data.synthetic_jax import (synthetic_batch_jax,
                                          synthetic_stacked_jax)
        # disjoint from the model/loader seed spaces; fresh scenes per
        # epoch via fold_in(epoch), like SyntheticDataset(fresh=True)
        data_key = jax.random.PRNGKey(args.seed + 424242)
        val_key = jax.random.PRNGKey(args.seed + 31337)  # FIXED val scenes

        def _device_stream(epoch):
            ek = jax.random.fold_in(data_key, epoch)
            for i in range(steps_per_epoch // K):
                kk = jax.random.fold_in(ek, i)
                yield (synthetic_batch_jax(cfg, kk) if K == 1 else
                       synthetic_stacked_jax(cfg, kk, K))

    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        if hasattr(train_ds, "set_epoch"):
            train_ds.set_epoch(epoch)
        if args.device_data:
            # already on-device; place() only re-lays-out for the mesh
            place = engine.place_batch if K == 1 else engine.place_stacked
            stream = (place(b) for b in _device_stream(epoch))
        elif K == 1:
            loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                                 num_workers=args.workers,
                                 seed=args.seed + epoch)
            stream = device_prefetch(iter(loader), size=2,
                                     placer=engine.place_batch)
        else:
            loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                                 num_workers=args.workers,
                                 seed=args.seed + epoch)
            stream = device_prefetch(_stacked(iter(loader), K), size=2,
                                     placer=engine.place_stacked)
        for batch in stream:
            rng, sub = jax.random.split(rng)
            if K == 1:
                state, metrics = engine.train_step(state, batch, sub)
            else:
                state, metrics = engine.train_step_scan(state, batch, sub)
            step += K
            if args.ckpt_every and step - last_ckpt >= args.ckpt_every:
                last_ckpt = step
                ckpt.save(state)
                export_npz(state, npz_path)
            if step - last_log >= args.log_every:
                last_log = step
                m = {k: float(v) for k, v in metrics.items()}
                logger.log_scalars("train", m, step)
                print(f"epoch {epoch} step {step}: " +
                      ", ".join(f"{k}={v:.4f}" for k, v in m.items()),
                      flush=True)

        # per-epoch validation (kitti/train_classifier.py:101-137)
        if args.device_data:
            # the SAME val scenes every epoch (val_key is not epoch-folded)
            val_stream = (engine.place_batch(
                synthetic_batch_jax(cfg, jax.random.fold_in(val_key, i)))
                for i in range(max(len(val_ds) // cfg.batch_size, 1)))
        else:
            val_loader = BatchLoader(val_ds, cfg.batch_size, shuffle=False,
                                     num_workers=args.workers, seed=0)
            val_stream = device_prefetch(iter(val_loader), size=2,
                                         placer=engine.place_batch)
        agg, n = {}, 0
        for batch in val_stream:
            metrics = engine.eval_step(state, batch)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        if n:
            val = {k: v / n for k, v in agg.items()}
            logger.log_scalars("val", val, int(state.step))
            print(f"epoch {epoch} VAL: " +
                  ", ".join(f"{k}={v:.4f}" for k, v in val.items()),
                  flush=True)
        ckpt.save(state, metrics=val if n else None)
        export_npz(state, npz_path)
        step = int(state.step)   # resync the host mirror at the epoch seam
        print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s",
              flush=True)

    logger.close()
    ckpt.close()
    return state


if __name__ == "__main__":
    main()
