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
