"""Solver debugging visualisations.

Equivalents of the reference's debug scripts
``evaluation/gauss_newton_visualization.py`` (single-problem solver trace)
and ``evaluation/visualization_for_paper.py`` (TP/FP/FN point colouring):

  * :func:`solver_trace` — run the LM one iteration at a time and record
    the cost trajectory + pose estimates;
  * :func:`trace_figure` — cost-vs-iteration plot;
  * :func:`tp_fp_fn_colors` — per-point color classes for 3D scatter
    (TP green / wrong-fine yellow / FN red / FP blue,
    ``visualization_for_paper.py:106-122``).
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..register.frustum_fast import lm_solve_fast
from ..register.frustum import theta_to_pose


def solver_trace(pc: np.ndarray, labels: np.ndarray, K: np.ndarray, *,
                 H: int, W: int, theta0, n_steps: int = 32,
                 t_lb=(-5.0, -0.1, -10.0), t_ub=(5.0, 0.1, 10.0)):
    """Cost trajectory of a single LM problem (debug-grade, one jit call per
    recorded step)."""
    theta = jnp.asarray(theta0, jnp.float32)[None, None]
    pts = jnp.asarray(pc, jnp.float32)[None]
    lab = jnp.asarray(labels, jnp.float32)[None]
    val = jnp.ones_like(lab)
    Kb = jnp.asarray(K, jnp.float32)[None]
    lb, ub = jnp.asarray(t_lb), jnp.asarray(t_ub)
    costs: List[float] = []
    poses = []
    for _ in range(n_steps):
        theta, cost, _ = lm_solve_fast(pts, lab, val, Kb, theta, lb, ub,
                                       H=H, W=W, max_iter=1, unroll=1)
        costs.append(float(cost[0, 0]))
        poses.append(np.asarray(theta_to_pose(theta[0, 0], True)))
    return costs, poses


def trace_figure(costs: List[float]):
    """Cost-vs-iteration matplotlib figure (returns np image)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..utils.vis import fig_to_np
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(costs, marker="o", ms=3)
    ax.set_xlabel("LM iteration")
    ax.set_ylabel("robustified cost")
    ax.set_yscale("log")
    fig.tight_layout()
    img = fig_to_np(fig)
    plt.close(fig)
    return img


def tp_fp_fn_colors(coarse_pred: np.ndarray, coarse_label: np.ndarray,
                    fine_pred=None, fine_label=None) -> np.ndarray:
    """(N, 3) float RGB per point: TP green / wrong-fine yellow / FN red /
    FP blue / true-negative gray."""
    n = len(coarse_pred)
    colors = np.full((n, 3), 0.6)
    tp = (coarse_pred == 1) & (coarse_label == 1)
    colors[tp] = (0, 1, 0)
    if fine_pred is not None and fine_label is not None:
        colors[tp & (fine_pred != fine_label)] = (1, 1, 0)
    colors[(coarse_pred == 0) & (coarse_label == 1)] = (1, 0, 0)
    colors[(coarse_pred == 1) & (coarse_label == 0)] = (0, 0, 1)
    return colors


def scene_figure(pc: np.ndarray, coarse_pred, coarse_label,
                 fine_pred=None, fine_label=None) -> np.ndarray:
    """Paper-style TP/FP/FN scene render, offline (matplotlib instead of
    the reference's interactive Open3D window,
    ``visualization_for_paper.py:106-122``): top-down + oblique views of
    the cloud coloured green/blue/red/gray."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..utils.vis import fig_to_np

    colors = tp_fp_fn_colors(coarse_pred, coarse_label, fine_pred,
                             fine_label)
    fig = plt.figure(figsize=(10, 5))
    ax = fig.add_subplot(1, 2, 1)
    ax.scatter(pc[:, 0], pc[:, 2], c=colors, s=1.5)
    ax.set_xlabel("x"); ax.set_ylabel("z")
    ax.set_title("top-down (TP green / FP blue / FN red)")
    ax.set_aspect("equal")
    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    ax3.scatter(pc[:, 0], pc[:, 2], -pc[:, 1], c=colors, s=1.0)
    ax3.set_title("oblique")
    ax3.view_init(elev=35, azim=-60)
    fig.tight_layout()
    img = fig_to_np(fig)
    plt.close(fig)
    return img


def _project(pc, P, K):
    cam = pc @ np.asarray(P)[:3, :3].T + np.asarray(P)[:3, 3]
    z = cam[:, 2]
    zs = np.where(z > 0.1, z, 1.0)
    px = K[0, 0] * cam[:, 0] / zs + K[0, 2]
    py = K[1, 1] * cam[:, 1] / zs + K[1, 2]
    return px, py, z > 0.1


def iteration_overlay(pc: np.ndarray, pred_inside: np.ndarray,
                      poses, K: np.ndarray, *, H: int, W: int,
                      P_gt=None, img: np.ndarray = None,
                      iters=(0, None, -1)) -> np.ndarray:
    """Solver-iteration overlay (the reference's is_debug per-iteration
    print, ``gauss_newton_visualization.py:105-152``, made visual): the
    inside-predicted points projected through the pose at selected
    iterations, drawn over the image (or a blank frustum canvas).  Points
    should converge into the image rectangle as iterations proceed."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ..utils.vis import fig_to_np

    sel = [i if i is not None else len(poses) // 2 for i in iters]
    inside = np.asarray(pred_inside) == 1
    fig, axes = plt.subplots(1, len(sel) + (P_gt is not None),
                             figsize=(4.2 * (len(sel) + 1), 3.6))
    panels = [(f"iter {i if i >= 0 else len(poses) + i}", poses[i])
              for i in sel]
    if P_gt is not None:
        panels.append(("GT pose", P_gt))
    for ax, (title, P) in zip(np.atleast_1d(axes), panels):
        if img is not None:
            ax.imshow(img.astype(np.uint8), extent=[0, W, H, 0])
        px, py, front = _project(pc[inside], P, K)
        ax.scatter(px[front], py[front], s=2, c="lime",
                   edgecolors="none", label="front")
        ax.scatter(px[~front], py[~front], s=2, c="red",
                   edgecolors="none", label="behind")
        ax.add_patch(plt.Rectangle((0, 0), W, H, fill=False,
                                   edgecolor="k", lw=1.5))
        ax.set_xlim(-0.6 * W, 1.6 * W)
        ax.set_ylim(1.6 * H, -0.6 * H)
        ax.set_title(title)
    fig.tight_layout()
    out = fig_to_np(fig)
    plt.close(fig)
    return out


def debug_report(data_dir: str, prefix: str, *, H: int, W: int,
                 out_dir: str, n_steps: int = 32,
                 use_labels: bool = False) -> dict:
    """Full per-sample solver debug dump: trace plot, TP/FP/FN scene
    render and iteration overlay written to ``out_dir``.

    The one-stop equivalent of running the reference's
    ``gauss_newton_visualization.py`` main on one dump file
    (``:105-152``): initial guess from the predictions, per-iteration LM
    trace from the perturbation-free init, final RTE/RRE."""
    import os
    import cv2
    import jax.numpy as jnp

    from ..register.frustum import initial_guess
    from ..register.metrics import pose_diff_np
    from .dump import load_dump

    os.makedirs(out_dir, exist_ok=True)
    d = load_dump(data_dir, prefix)
    pred = d["coarse_label"] if use_labels else d["coarse_pred"]
    ang, valid = initial_guess(jnp.asarray(d["pc"], jnp.float32),
                               jnp.asarray(pred))
    theta0 = np.array([float(ang), 0.0, 0.0, 0.0], np.float32)
    costs, poses = solver_trace(d["pc"].astype(np.float32),
                                pred.astype(np.float32),
                                d["K"].astype(np.float32), H=H, W=W,
                                theta0=theta0, n_steps=n_steps)
    rte, rre = pose_diff_np(np.asarray(poses[-1], np.float64), d["P"])

    cv2.imwrite(os.path.join(out_dir, prefix + "_trace.png"),
                cv2.cvtColor(trace_figure(costs), cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(out_dir, prefix + "_scene.png"),
                cv2.cvtColor(scene_figure(d["pc"], d["coarse_pred"],
                                          d["coarse_label"],
                                          d["fine_pred"],
                                          d["fine_label"]),
                             cv2.COLOR_RGB2BGR))
    img_path = os.path.join(data_dir, prefix + "_img.npy")
    img = np.load(img_path) if os.path.isfile(img_path) else None
    P0 = np.eye(4)
    c0, s0 = np.cos(theta0[0]), np.sin(theta0[0])
    P0[:3, :3] = [[c0, 0, s0], [0, 1, 0], [-s0, 0, c0]]
    cv2.imwrite(os.path.join(out_dir, prefix + "_overlay.png"),
                cv2.cvtColor(iteration_overlay(d["pc"], pred,
                                               [P0] + list(poses), d["K"],
                                               H=H, W=W, P_gt=d["P"],
                                               img=img),
                             cv2.COLOR_RGB2BGR))
    return {"prefix": prefix, "final_cost": costs[-1],
            "rte": float(rte), "rre": float(rre)}
