"""Evaluation entry point.

The one-stop equivalent of the reference's evaluation script collection
(``evaluation/visualize_and_save_data.py`` + ``registration_lsq.py`` +
``registration_pnp.py`` + ``icp/registration_icp.py`` +
``registration_random.py`` + ``registration_result_analysis.py``):

    # 1. dump predictions (from a checkpoint) on the val_random_Ry split
    python -m deepi2p_tpu.eval.cli dump --dataset oxford --dataroot ... \
        --checkpoint checkpoints --out runs/dump

    # 2. solve + report RTE/RRE/success
    python -m deepi2p_tpu.eval.cli solve --data-dir runs/dump \
        --method frustum --img-h 384 --img-w 640
"""
from __future__ import annotations

import argparse
import json

import jax


def main(argv=None):
    p = argparse.ArgumentParser(description="DeepI2P-TPU evaluation")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump", help="inference dump in the npy contract")
    d.add_argument("--dataset", default="synthetic",
                   choices=["oxford", "kitti", "nuscenes", "synthetic"])
    d.add_argument("--dataroot", default="")
    d.add_argument("--checkpoint", default="")
    d.add_argument("--out", required=True)
    d.add_argument("--batch-size", type=int, default=None)
    d.add_argument("--max-batches", type=int, default=None)
    d.add_argument("--points", type=int, default=None)
    d.add_argument("--nodes", type=int, default=None)
    d.add_argument("--img-h", type=int, default=None)
    d.add_argument("--img-w", type=int, default=None)
    d.add_argument("--synthetic-scene", default=None,
                   choices=["uniform", "street"],
                   help="synthetic cloud structure (see config.py)")
    d.add_argument("--synthetic-preset", default="tiny",
                   choices=["tiny", "kitti", "oxford", "nuscenes"],
                   help="config preset for --dataset synthetic (must match "
                        "the training preset)")
    d.add_argument("--dump-len", type=int, default=16,
                   help="synthetic dump set size")
    d.add_argument("--save-images", action="store_true",
                   help="also save {prefix}_img.npy (enables depth-dump)")
    d.add_argument("--save-probs", action="store_true",
                   help="also save {prefix}_p.npy inside-probabilities "
                        "(host-side threshold sweeps)")
    d.add_argument("--inside-threshold", type=float, default=None,
                   help="coarse decision p_inside > t instead of argmax "
                        "(recall-heavy operating point for the frustum "
                        "solver; argmax = reference behavior)")
    d.add_argument("--classify-n", type=int, default=0,
                   help="classify at this TRAINED point count on shuffled "
                        "subsets and ensemble per-point probabilities "
                        "(eval.dump.SubsampleEnsemble); the dump stays at "
                        "--points; 0 = off")
    d.add_argument("--classify-repeats", type=int, default=1,
                   help="average the ensemble over this many independent "
                        "shuffled covers (variance reduction; linear cost)")

    dd = sub.add_parser("depth-dump",
                        help="estimated-depth pseudo point clouds for ICP "
                             "(the reference's save_depth_map.py stage)")
    dd.add_argument("--data-dir", required=True,
                    help="dump dir containing {prefix}_img.npy + _K.npy")
    dd.add_argument("--depth-checkpoint", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--stride", type=int, default=4)

    s = sub.add_parser("solve", help="registration over a dump directory")
    s.add_argument("--data-dir", required=True)
    s.add_argument("--method", default="frustum",
                   choices=["frustum", "pnp", "icp", "random"])
    s.add_argument("--img-h", type=int, required=True)
    s.add_argument("--img-w", type=int, required=True)
    s.add_argument("--stride", type=int, default=1)
    s.add_argument("--n-inits", type=int, default=60)
    s.add_argument("--max-iter", type=int, default=64)
    s.add_argument("--use-labels", action="store_true",
                   help="solve from GT labels (oracle mode)")
    s.add_argument("--pseudo-dir", default=None)
    s.add_argument("--save-dir", default=None)
    s.add_argument("--outside-weight", type=float, default=1.0,
                   help="frustum cost: weight on outside-labelled blocks "
                        "(<1 tolerates recall-limited predictions; 1.0 = "
                        "reference cost)")
    s.add_argument("--inside-threshold", type=float, default=None,
                   help="re-derive coarse_pred as p_inside > t from dumps "
                        "written with --save-probs (recall-heavy operating "
                        "point, no network re-run)")
    s.add_argument("--enu2cam", action="store_true",
                   help="convert ENU dumps (nuScenes) to camera convention "
                        "before solving (registration_lsq.py:237-248)")
    s.add_argument("--icp-coarse-threshold", type=float, default=None,
                   help="icp: multi-scale anneal start in metres (None = "
                        "the reference's fixed 1 m; widens the "
                        "convergence basin)")
    s.add_argument("--icp-seed", default="none",
                   choices=["none", "frustum"],
                   help="icp: seed half the inits around the frustum "
                        "solution from the same predictions")
    s.add_argument("--debug-vis", default=None, metavar="DIR",
                   help="write per-sample solver debug images (trace, "
                        "TP/FP/FN scene, iteration overlay) to DIR")
    s.add_argument("--debug-vis-max", type=int, default=4)
    args = p.parse_args(argv)

    if args.cmd == "depth-dump":
        import os
        import numpy as np
        from .. import config as config_mod
        from ..train.depth_cli import load_depth_fn
        from .depth import dump_pseudo_pointclouds
        from .dump import list_dump_prefixes

        cfg = config_mod.tiny()
        depth_fn = load_depth_fn(args.depth_checkpoint, cfg)
        n = 0
        for prefix in list_dump_prefixes(args.data_dir):
            img_path = os.path.join(args.data_dir, prefix + "_img.npy")
            if not os.path.isfile(img_path):
                continue
            K = np.load(os.path.join(args.data_dir, prefix + "_K.npy"))
            n += dump_pseudo_pointclouds([(prefix, np.load(img_path))], K,
                                         depth_fn, args.out,
                                         stride=args.stride)
        print(json.dumps({"pseudo_clouds": n, "out": args.out}))
        return n

    if args.cmd == "solve":
        from .harness import evaluate_registration
        summ = evaluate_registration(
            args.data_dir, method=args.method, H=args.img_h, W=args.img_w,
            stride=args.stride, n_inits=args.n_inits, max_iter=args.max_iter,
            use_labels=args.use_labels, pseudo_dir=args.pseudo_dir,
            save_dir=args.save_dir, enu2cam=args.enu2cam,
            outside_weight=args.outside_weight,
            inside_threshold=args.inside_threshold,
            icp_coarse_threshold=args.icp_coarse_threshold,
            icp_seed=args.icp_seed)
        if args.debug_vis:
            from .debug_vis import debug_report
            from .dump import list_dump_prefixes
            for p in list_dump_prefixes(args.data_dir)[:args.debug_vis_max]:
                r = debug_report(args.data_dir, p, H=args.img_h,
                                 W=args.img_w, out_dir=args.debug_vis,
                                 use_labels=args.use_labels)
                print(json.dumps({"debug_vis": r}))
        print(json.dumps(summ, indent=2))
        return summ

    # dump
    from .. import config as config_mod
    from ..train.engine import Engine
    from ..train.checkpoint import CheckpointManager
    from ..data import BatchLoader, SyntheticDataset
    from .dump import dump_predictions

    if args.dataset == "synthetic" and args.synthetic_preset != "tiny":
        maker = {"kitti": config_mod.kitti, "oxford": config_mod.oxford,
                 "nuscenes": config_mod.nuscenes}[args.synthetic_preset]
    else:
        maker = {"oxford": config_mod.oxford, "kitti": config_mod.kitti,
                 "nuscenes": config_mod.nuscenes,
                 "synthetic": config_mod.tiny}[args.dataset]
    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.points:
        overrides["input_pt_num"] = args.points
    if args.nodes:
        overrides["node_a_num"] = args.nodes
        overrides["node_b_num"] = args.nodes
        overrides["k_ab"] = min(maker().k_ab, args.nodes)
    if args.img_h:
        overrides["img_H"] = args.img_h
    if args.img_w:
        overrides["img_W"] = args.img_w
    if getattr(args, "synthetic_scene", None):
        overrides["synthetic_scene"] = args.synthetic_scene
    cfg = maker(**overrides)

    if args.dataset == "synthetic":
        ds = SyntheticDataset(cfg, length=args.dump_len, seed=7)
    elif args.dataset == "oxford":
        from ..data import OxfordLoader
        ds = OxfordLoader(args.dataroot, "val_random_Ry", cfg)
    elif args.dataset == "kitti":
        from ..data import KittiLoader
        ds = KittiLoader(args.dataroot, "val", cfg)
        ds.mode = "val_random_Ry"
    else:
        from ..data import NuScenesLoader
        ds = NuScenesLoader(args.dataroot, "val", cfg)
        ds.mode = "val_random_Ry"

    # --classify-n: the network runs at its trained point count on shuffled
    # subsets; dump geometry (cloud, labels) stays at cfg.input_pt_num
    ecfg = cfg if not args.classify_n else cfg.replace(
        input_pt_num=args.classify_n)
    engine = Engine(ecfg)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=False, num_workers=4)
    example = next(iter(loader))
    if args.classify_n:
        n = args.classify_n
        example = dict(example, pc=example["pc"][:, :n],
                       intensity=example["intensity"][:, :n],
                       sn=example["sn"][:, :n])
    import jax.numpy as jnp
    state = engine.init_state(jax.random.PRNGKey(0),
                              {k: jnp.asarray(v) for k, v in example.items()})
    if args.checkpoint:
        if args.checkpoint.endswith(".npz"):
            # compact params+BN+step snapshot (train.checkpoint.export_npz) —
            # the artifact that survives VM rebuilds and is committed to git,
            # so headline tables are regenerable from a fresh clone
            from ..train.checkpoint import warm_start_npz
            state = warm_start_npz(state, args.checkpoint, engine.tx)
        else:
            mgr = CheckpointManager(args.checkpoint)
            state = mgr.restore(state)
            mgr.close()
    if args.classify_n:
        from .dump import SubsampleEnsemble
        engine = SubsampleEnsemble(engine, seed=0,
                                   repeats=args.classify_repeats)
    coarse_acc, fine_acc = dump_predictions(
        engine, state, iter(loader), cfg, args.out,
        max_batches=args.max_batches, save_images=args.save_images,
        inside_threshold=args.inside_threshold, save_probs=args.save_probs)
    print(json.dumps({"coarse_accuracy": coarse_acc,
                      "fine_accuracy": fine_acc}))


if __name__ == "__main__":
    main()
