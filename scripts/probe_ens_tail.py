"""Decompose the n20k ensemble failure on its WORST eval samples.

Round-5 finding: ensemble accuracy anti-correlates with inside fraction
(-0.44) — the hard tail is the samples whose images are the most
OOD-dense (splat pixels scale with N x inside_frac; training maxed at
~8192 x frac).  For the 8 worst samples of the committed chip dump, run:
  a) ensemble + full-density image  (chip condition — sanity match)
  b) ensemble + image re-rendered from an 8192-pt subset (trained density)
  c) direct native inference on ONE 8192-pt subset with its own
     trained-density image (fully in-distribution control; accuracy
     measured on the subset's 8192 points)
If (b) ~ (c) ~ native-level (0.95), image density is the whole story and
`img_render_n` (pin the splat density to the trained N) closes the n20k
transfer gap honestly: in the reference the camera image never depends
on the lidar point count.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config as config_mod
from deepi2p_tpu.data.synthetic import synthetic_batch
from deepi2p_tpu.train.engine import Engine
from deepi2p_tpu.train.checkpoint import warm_start_npz
from deepi2p_tpu.eval.dump import SubsampleEnsemble
from deepi2p_tpu.ops.projection import generate_labels

CKPT = "ckpts/kitti_shape_r4/latest.npz"
WORST = [26, 40, 16, 34, 42, 12, 45, 17]
N_EVAL, N_TRAIN = 20480, 8192

cfg = config_mod.kitti(batch_size=8, input_pt_num=N_EVAL,
                       node_a_num=128, node_b_num=128, k_ab=16,
                       img_H=160, img_W=512, synthetic_scene="street")
ecfg = cfg.replace(input_pt_num=N_TRAIN)

# rebuild the exact eval samples (SyntheticDataset._seed = (7<<40)+i)
samples = [
    {k: v[0] for k, v in synthetic_batch(cfg, batch_size=1,
                                         seed=(7 << 40) + i).items()}
    for i in WORST]
batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}

engine = Engine(ecfg)
example = dict(batch)
for k in ("pc", "intensity", "sn"):
    example[k] = batch[k][:, :N_TRAIN]
template = engine.init_state(jax.random.PRNGKey(0),
                             {k: jnp.asarray(v) for k, v in example.items()})
state = warm_start_npz(template, CKPT, engine.tx)
ens = SubsampleEnsemble(engine, seed=0)


def labels_for(pc, batch):
    lab = generate_labels(jnp.asarray(pc), jnp.asarray(batch["P"]),
                          jnp.asarray(batch["K"]), cfg.img_H, cfg.img_W,
                          cfg.img_fine_resolution_scale)
    return np.asarray(lab.coarse)


def render_img(pc, intensity, P, K, H, W, rng):
    img = rng.uniform(0, 60, (H, W, 3)).astype(np.float32)
    cam = pc @ P[:3, :3].T + P[:3, 3]
    z = cam[:, 2]
    front = z > 0.1
    u = (K[0, 0] * cam[:, 0] / np.where(front, z, 1.0) + K[0, 2]).astype(np.int32)
    v = (K[1, 1] * cam[:, 1] / np.where(front, z, 1.0) + K[1, 2]).astype(np.int32)
    m = front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    order = np.argsort(-z[m], kind="stable")
    vi, ui, zi = v[m][order], u[m][order], z[m][order]
    img[vi, ui, 0] = np.clip(255.0 * 5.0 / np.maximum(zi, 1.0), 0, 255)
    img[vi, ui, 1] = intensity[m, 0][order] * 255.0
    img[vi, ui, 2] = 128.0
    return img


lab_full = labels_for(batch["pc"], batch)


def report(tag, pred, lab):
    pred, lab = np.asarray(pred), np.asarray(lab)
    per = (pred == lab).mean(axis=1)
    print(f"{tag}: mean={per.mean():.4f} per-sample="
          f"{np.array2string(per, precision=3)}", flush=True)


# (a) chip condition
p, _ = ens.infer_probs(state, {k: jnp.asarray(v) for k, v in batch.items()})
report("a) ensemble, full-density img", (np.asarray(p) > 0.5), lab_full)

# (b) trained-density image
rng = np.random.default_rng(0)
imgs = []
for b in range(len(WORST)):
    sub = rng.choice(N_EVAL, N_TRAIN, replace=False)
    imgs.append(render_img(batch["pc"][b][sub], batch["intensity"][b][sub],
                           batch["P"][b], batch["K"][b],
                           cfg.img_H, cfg.img_W, rng))
batch_b = dict(batch, img=np.stack(imgs))
p, _ = ens.infer_probs(state, {k: jnp.asarray(v) for k, v in batch_b.items()})
report("b) ensemble, trained-density img", (np.asarray(p) > 0.5), lab_full)

# (c) fully-native control: ONE subset, its own image, direct inference
rng = np.random.default_rng(1)
sub_idx = np.stack([rng.choice(N_EVAL, N_TRAIN, replace=False)
                    for _ in range(len(WORST))])
nat = {}
for k in ("pc", "intensity", "sn"):
    nat[k] = np.take_along_axis(batch[k], sub_idx[..., None], axis=1)
na = rng.integers(0, N_TRAIN, (len(WORST), 128))
nb = rng.integers(0, N_TRAIN, (len(WORST), 128))
nat["node_a"] = np.take_along_axis(nat["pc"], na[..., None], axis=1)
nat["node_b"] = np.take_along_axis(nat["pc"], nb[..., None], axis=1)
nat["P"], nat["K"] = batch["P"], batch["K"]
nat["img"] = np.stack([
    render_img(nat["pc"][b], nat["intensity"][b], batch["P"][b],
               batch["K"][b], cfg.img_H, cfg.img_W, rng)
    for b in range(len(WORST))])
lab_sub = labels_for(nat["pc"], batch)
p, _ = engine.infer_probs(state, {k: jnp.asarray(v) for k, v in nat.items()})
report("c) native single-subset direct", (np.asarray(p) > 0.5), lab_sub)
