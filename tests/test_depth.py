"""Depth estimator + pseudo-cloud pipeline (the reference's monodepth2
stage, ``evaluation/icp/save_depth_map.py:60-102``, rebuilt in-repo)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.models.depth import DepthNet, depth_loss


CFG = config.tiny(synthetic_scene="street", input_pt_num=1024)


def test_synthetic_depth_matches_render():
    """The with_depth=True output is the z-buffered nearest depth per
    splatted pixel, 0 elsewhere — consistent with the rendered image's
    inverse-depth channel."""
    b = synthetic_batch(CFG, batch_size=1, seed=4, with_depth=True)
    depth, img = b["depth"][0], b["img"][0]
    m = depth > 0
    assert m.sum() > 50
    # channel 0 encodes clip(255*5/max(z,1)) of the same winning point
    expect = np.clip(255.0 * 5.0 / np.maximum(depth[m], 1.0), 0, 255)
    np.testing.assert_allclose(img[m][:, 0], expect, rtol=1e-5)


def test_depthnet_shapes_and_loss_grad():
    model = DepthNet(widths=(8, 16, 32))
    b = synthetic_batch(CFG, batch_size=2, seed=1, with_depth=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b["img"]))
    pred = model.apply(params, jnp.asarray(b["img"]))
    assert pred.shape == (2, CFG.img_H, CFG.img_W)
    assert bool((pred > 0).all())
    loss, grads = jax.value_and_grad(
        lambda p: depth_loss(model.apply(p, jnp.asarray(b["img"])),
                             jnp.asarray(b["depth"])))(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_depth_train_save_load_roundtrip(tmp_path):
    from deepi2p_tpu.train.depth_cli import (train_depth, save_depth_params,
                                             load_depth_fn)
    model, params, val = train_depth(CFG, steps=6, batch_size=2, lr=3e-4,
                                     log_every=100, eval_batches=1)
    assert np.isfinite(val)
    ckpt = str(tmp_path / "depth_ckpt")
    save_depth_params(params, ckpt)
    fn = load_depth_fn(ckpt, CFG)
    img = synthetic_batch(CFG, batch_size=1, seed=9)["img"][0]
    d = fn(img)
    assert d.shape == (CFG.img_H, CFG.img_W) and (d > 0).all()


def test_depth_dump_cli(tmp_path):
    """dump --save-images -> depth-dump produces {prefix}_pc.npy pseudo
    clouds consumable by the ICP harness (pseudo_dir contract)."""
    from deepi2p_tpu.train.depth_cli import train_depth, save_depth_params
    from deepi2p_tpu.eval import cli as eval_cli

    # fabricate a tiny dump with images
    dump_dir = str(tmp_path / "dump"); os.makedirs(dump_dir)
    b = synthetic_batch(CFG, batch_size=2, seed=3)
    for i in range(2):
        np.save(os.path.join(dump_dir, f"{i:06d}_00_img.npy"), b["img"][i])
        np.save(os.path.join(dump_dir, f"{i:06d}_00_K.npy"), b["K"][i])

    _, params, _ = train_depth(CFG, steps=2, batch_size=2, lr=3e-4,
                               log_every=100, eval_batches=1)
    ckpt = str(tmp_path / "depth_ckpt")
    save_depth_params(params, ckpt)

    out = str(tmp_path / "pseudo")
    n = eval_cli.main(["depth-dump", "--data-dir", dump_dir,
                       "--depth-checkpoint", ckpt, "--out", out,
                       "--stride", "4"])
    assert n == 2
    pc = np.load(os.path.join(out, "000000_00_pc.npy"))
    assert pc.shape[0] == 3 and pc.shape[1] > 0
    assert np.isfinite(pc).all() and (pc[2] > 0).all()
