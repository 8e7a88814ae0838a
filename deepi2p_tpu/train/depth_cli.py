"""Depth-net trainer (auxiliary model for the ICP pipeline).

The reference's ICP evaluation begins with an externally-trained
monodepth2 model (``evaluation/icp/save_depth_map.py:60-102``).  This
trainer produces the in-repo equivalent: ``models.depth.DepthNet``
trained on the synthetic renderer's z-buffered GT depth, with a fresh
scene per step (infinite-data regime — no memorization).

    python -m deepi2p_tpu.train.depth_cli --steps 2000 \
        --checkpoints-dir DEPTH_CKPT --scene street
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as config_mod
from ..data import synthetic_batch
from ..models.depth import DepthNet, depth_loss


def make_train_step(model, tx):
    @jax.jit
    def step(params, opt_state, img, depth):
        def loss_fn(p):
            return depth_loss(model.apply(p, img), depth)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    return step


def train_depth(cfg, *, steps: int, batch_size: int, lr: float,
                seed: int = 0, log_every: int = 50,
                eval_batches: int = 4, dense: bool = False):
    model = DepthNet(dtype=jnp.dtype(cfg.compute_dtype)
                     if cfg.compute_dtype != "float32" else None)
    ex = synthetic_batch(cfg, batch_size=batch_size, seed=(seed << 40),
                         with_depth=True, dense_depth=dense)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(ex["img"]))
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx)

    t0 = time.time()
    for i in range(steps):
        b = synthetic_batch(cfg, batch_size=batch_size,
                            seed=(seed << 40) + 1 + i, with_depth=True,
                            dense_depth=dense)
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(b["img"]),
                                          jnp.asarray(b["depth"]))
        if i % log_every == 0 or i == steps - 1:
            print(f"depth step {i}: log-L1 {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval (disjoint seed block)
    errs = []
    for i in range(eval_batches):
        b = synthetic_batch(cfg, batch_size=batch_size,
                            seed=((seed + 1) << 40) + i, with_depth=True,
                            dense_depth=dense)
        pred = model.apply(params, jnp.asarray(b["img"]))
        errs.append(float(depth_loss(pred, jnp.asarray(b["depth"]))))
    val = float(np.mean(errs))
    print(f"depth val log-L1: {val:.4f}")
    return model, params, val


def save_depth_params(params, directory: str):
    import orbax.checkpoint as ocp
    import os
    mgr = ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
    mgr.save(0, args=ocp.args.StandardSave(params))
    mgr.wait_until_finished()
    mgr.close()


def load_depth_fn(directory: str, cfg):
    """Restore a trained DepthNet as ``depth_fn(img_hw3) -> depth_hw``
    (the callable contract of ``eval.depth.dump_pseudo_pointclouds``)."""
    import orbax.checkpoint as ocp
    import os
    model = DepthNet(dtype=jnp.dtype(cfg.compute_dtype)
                     if cfg.compute_dtype != "float32" else None)
    ex = synthetic_batch(cfg, batch_size=1, seed=0)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(ex["img"])))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no depth checkpoint in {directory}")
    params = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    apply = jax.jit(model.apply)

    def depth_fn(img):
        return np.asarray(apply(params, jnp.asarray(img,
                                                    np.float32)[None]))[0]
    return depth_fn


def main(argv=None):
    p = argparse.ArgumentParser(description="DeepI2P-TPU depth trainer")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--scene", default="street",
                   choices=["uniform", "street"])
    p.add_argument("--img-h", type=int, default=64,
                   help="training image height — match the geometry of the "
                        "dump the depth maps will be estimated for")
    p.add_argument("--img-w", type=int, default=96)
    p.add_argument("--dense-targets", action="store_true",
                   help="train on DENSE ray-cast GT depth (street scenes) "
                        "instead of the sparse splat z-buffer — every "
                        "pixel supervised, scene-exit rays at the far cap "
                        "(see data.synthetic.raycast_street_depth)")
    p.add_argument("--checkpoints-dir", default="depth_checkpoints")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = config_mod.tiny(synthetic_scene=args.scene,
                          input_pt_num=args.points,
                          img_H=args.img_h, img_W=args.img_w)
    _, params, val = train_depth(cfg, steps=args.steps,
                                 batch_size=args.batch_size, lr=args.lr,
                                 seed=args.seed, dense=args.dense_targets)
    save_depth_params(params, args.checkpoints_dir)
    print(f"saved depth checkpoint to {args.checkpoints_dir} "
          f"(val log-L1 {val:.4f})")
    return val


if __name__ == "__main__":
    main()
