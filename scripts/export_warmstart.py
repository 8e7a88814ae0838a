"""Export the latest orbax checkpoint of a run to a compact warm-start .npz.

Usage (CPU env, safe next to a live TPU job):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/export_warmstart.py \
        --checkpoints-dir /root/repo/ckpts/street_r3 --out ckpts/street_r3.npz

Only the git repo survives VM rebuilds between sessions (the round-3
epoch-25 checkpoint died in /tmp), so the params+BN+step snapshot — 1/3
the size of the full Adam state — is what gets committed; the trainer's
``--warm-start`` flag resumes from it with fresh optimizer moments.

Defaults mirror the Run B street config (BENCH_NOTES round 3).
"""
import argparse

import jax

from deepi2p_tpu import config as config_mod
from deepi2p_tpu.data import BatchLoader, SyntheticDataset
from deepi2p_tpu.train.checkpoint import CheckpointManager, export_npz
from deepi2p_tpu.train.engine import Engine


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoints-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--points", type=int, default=4096)
    p.add_argument("--nodes", type=int, default=64)
    p.add_argument("--img-h", type=int, default=96)
    p.add_argument("--img-w", type=int, default=160)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)

    cfg = config_mod.tiny(
        input_pt_num=args.points, node_a_num=args.nodes,
        node_b_num=args.nodes, img_H=args.img_h, img_W=args.img_w,
        batch_size=args.batch_size, synthetic_scene="street",
        k_ab=min(config_mod.tiny().k_ab, args.nodes))
    engine = Engine(cfg)
    ds = SyntheticDataset(cfg, length=args.batch_size, seed=0)
    example = next(iter(BatchLoader(ds, cfg.batch_size, num_workers=1,
                                    seed=0)))
    template = engine.init_state(jax.random.PRNGKey(0), example)
    ckpt = CheckpointManager(args.checkpoints_dir)
    state = ckpt.restore(template)
    export_npz(state, args.out)
    print(f"exported step {int(state.step)} -> {args.out}")
    ckpt.close()


if __name__ == "__main__":
    main()
