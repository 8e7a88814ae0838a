"""Control probe: does SubsampleEnsemble degrade a NATIVE n8192 batch?

n_sub=1 makes the wrapper a shuffled pass-through: direct inference and
wrapper inference must agree (up to node resampling noise).  If they
don't, the n20k ensemble failure is a wrapper bug, not a distribution
shift.
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
B, N = 2, 8192

cfg = config_mod.kitti(batch_size=B, input_pt_num=N,
                       node_a_num=128, node_b_num=128, k_ab=16,
                       img_H=160, img_W=512, synthetic_scene="street")
batch = synthetic_batch(cfg, batch_size=B, seed=7)

engine = Engine(cfg)
jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
template = engine.init_state(jax.random.PRNGKey(0), jbatch)
state = warm_start_npz(template, CKPT, engine.tx)

labels = generate_labels(jbatch["pc"], jbatch["P"], jbatch["K"],
                         cfg.img_H, cfg.img_W, cfg.img_fine_resolution_scale)
lab = np.asarray(labels.coarse)


def report(tag, pred):
    pred = np.asarray(pred)
    inside = lab == 1
    tp = ((pred == 1) & inside).sum()
    print(f"{tag}: acc={(pred == lab).mean():.4f} "
          f"prec={tp / max((pred == 1).sum(), 1):.3f} "
          f"rec={tp / max(inside.sum(), 1):.3f} "
          f"pred_in={(pred == 1).mean():.4f} true_in={inside.mean():.4f}",
          flush=True)


p_dir, _ = engine.infer_probs(state, jbatch)
report("direct", (np.asarray(p_dir) > 0.5).astype(np.int32))

ens = SubsampleEnsemble(engine, seed=0)
p_ens, _ = ens.infer_probs(state, jbatch)
report("ensemble n_sub=1", (np.asarray(p_ens) > 0.5).astype(np.int32))
print("prob corr:", np.corrcoef(np.asarray(p_dir).ravel(),
                                np.asarray(p_ens).ravel())[0, 1], flush=True)
