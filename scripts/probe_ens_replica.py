"""Replicate the chip's n20k ensemble dump on CPU, sample-for-sample.

Same SyntheticDataset seeds, batch composition, and SubsampleEnsemble
RNG stream as scripts/repro_headline.py --classify-n 8192.  Prints
per-sample coarse accuracy next to the chip dump's value: agreement
means the 0.818 chip result is the true CPU-reproducible behavior of
the ensemble (a modeling failure to explain), disagreement means a
chip-specific defect in the ensemble inference path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu import config as config_mod
from deepi2p_tpu.data import BatchLoader, SyntheticDataset
from deepi2p_tpu.train.engine import Engine
from deepi2p_tpu.train.checkpoint import warm_start_npz
from deepi2p_tpu.eval.dump import SubsampleEnsemble
from deepi2p_tpu.ops.projection import generate_labels

CKPT = "ckpts/kitti_shape_r4/latest.npz"
CHIP_DUMP = "ckpts/kitti_shape_r4/headline_dump_n20k_ens"
N_BATCHES = 2

cfg = config_mod.kitti(batch_size=8, input_pt_num=20480,
                       node_a_num=128, node_b_num=128, k_ab=16,
                       img_H=160, img_W=512, synthetic_scene="street")
ecfg = cfg.replace(input_pt_num=8192)

ds = SyntheticDataset(cfg, length=48, seed=7)
loader = BatchLoader(ds, cfg.batch_size, shuffle=False, num_workers=2)

engine = Engine(ecfg)
example = next(iter(loader))
example = dict(example, pc=example["pc"][:, :8192],
               intensity=example["intensity"][:, :8192],
               sn=example["sn"][:, :8192])
template = engine.init_state(jax.random.PRNGKey(0),
                             {k: jnp.asarray(v) for k, v in example.items()})
state = warm_start_npz(template, CKPT, engine.tx)
ens = SubsampleEnsemble(engine, seed=0)

idx = 0
for bi, batch in enumerate(loader):
    if bi >= N_BATCHES:
        break
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    p, _ = ens.infer_probs(state, jbatch)
    pred = (np.asarray(p) > 0.5).astype(np.int32)
    labels = generate_labels(jbatch["pc"], jbatch["P"], jbatch["K"],
                             cfg.img_H, cfg.img_W,
                             cfg.img_fine_resolution_scale)
    lab = np.asarray(labels.coarse)
    for b in range(pred.shape[0]):
        cpu_acc = (pred[b] == lab[b]).mean()
        dd = np.load(f"{CHIP_DUMP}/{idx:06d}_00_pc_label.npy")
        chip_acc = (dd[3] == dd[4]).mean()
        # also verify the clouds are identical (same dataset stream)
        pc_match = np.allclose(dd[0:3].T, np.asarray(batch["pc"][b]),
                               atol=1e-5)
        chip_pred = dd[3].astype(np.int32)
        agree = (pred[b] == chip_pred).mean()
        print(f"sample {idx:02d}: cpu_acc={cpu_acc:.4f} "
              f"chip_acc={chip_acc:.4f} pred_agree={agree:.4f} "
              f"same_cloud={pc_match}", flush=True)
        idx += 1
