"""Round-5 hypothesis probe: is the n20k transfer gap the IMAGE density?

The synthetic image is a z-buffered splat of the SAME cloud that the
point branch consumes, so evaluating at N=20480 through a model trained
at N=8192 changes TWO input distributions at once: points-per-node
(fixed by eval.dump.SubsampleEnsemble) and splat density in the image
(2.5x more filled pixels than any training image).  The subsample
ensemble measured 0.818 on-chip — barely above the 0.822 raw transfer —
which is consistent with the image branch, not the point branch, being
the binding shift.

This probe runs the committed kitti-shape checkpoint (trained N=8192)
on N=20480 clouds twice, CPU, B small:
  a) image rendered from the full 20480 points (status quo),
  b) image re-rendered from an 8192-point subset (training density),
both through SubsampleEnsemble.  If (b) recovers ~0.95 coarse accuracy
the fix is an ``img_render_n`` knob in the synthetic generators: in the
reference's real-data setting the camera image never depends on the
lidar point count (kitti/kitti_pc_img_pose_loader.py reads the png as
is), so pinning the synthetic splat density to the trained N is the
faithful analogue, not a benchmark hack.
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
B, N_EVAL, N_TRAIN = 2, 20480, 8192


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
    ii = intensity[m, 0][order]
    img[vi, ui, 0] = np.clip(255.0 * 5.0 / np.maximum(zi, 1.0), 0, 255)
    img[vi, ui, 1] = ii * 255.0
    img[vi, ui, 2] = 128.0
    return img


def main():
    cfg = config_mod.kitti(batch_size=B, input_pt_num=N_EVAL,
                           node_a_num=128, node_b_num=128, k_ab=16,
                           img_H=160, img_W=512, synthetic_scene="street")
    ecfg = cfg.replace(input_pt_num=N_TRAIN)
    batch = synthetic_batch(cfg, batch_size=B, seed=7)

    engine = Engine(ecfg)
    example = {k: jnp.asarray(v[:, :N_TRAIN]) if v.ndim >= 2 and
               v.shape[1] == N_EVAL else jnp.asarray(v)
               for k, v in batch.items()}
    template = engine.init_state(jax.random.PRNGKey(0), example)
    state = warm_start_npz(template, CKPT, engine.tx)
    ens = SubsampleEnsemble(engine, seed=0)

    labels = generate_labels(jnp.asarray(batch["pc"]), jnp.asarray(batch["P"]),
                             jnp.asarray(batch["K"]), cfg.img_H, cfg.img_W,
                             cfg.img_fine_resolution_scale)
    lab = np.asarray(labels.coarse)

    def acc(tag, bat):
        p, _ = ens.infer_probs(state, bat)
        pred = (p > 0.5).astype(np.int32)
        a = (pred == lab).mean()
        inside = lab == 1
        prec = (pred[inside == 1] == 1).sum() / max((pred == 1).sum(), 1)
        tp = ((pred == 1) & inside).sum()
        print(f"{tag}: coarse_acc={a:.4f} precision={tp / max((pred == 1).sum(), 1):.3f} "
              f"recall={tp / max(inside.sum(), 1):.3f} "
              f"pred_inside_frac={(pred == 1).mean():.4f} "
              f"true_inside_frac={inside.mean():.4f}", flush=True)
        return a

    acc("full-density image (status quo)", batch)

    # (b) re-render each image from an 8192-point subset (trained density)
    rng = np.random.default_rng(0)
    batch_b = dict(batch)
    imgs = []
    for b in range(B):
        sub = rng.choice(N_EVAL, N_TRAIN, replace=False)
        imgs.append(render_img(batch["pc"][b][sub], batch["intensity"][b][sub],
                               batch["P"][b], batch["K"][b],
                               cfg.img_H, cfg.img_W, rng))
    batch_b["img"] = np.stack(imgs)
    acc("trained-density image (8192-pt splat)", batch_b)


if __name__ == "__main__":
    main()
