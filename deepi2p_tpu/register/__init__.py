"""Pose registration solvers (L6) — all batched on-device.

The reference fans its solvers out over CPU processes; here every solver is
a ``vmap`` over (pairs x random initialisations) on the TPU:

  * :mod:`frustum` — inverse-camera-projection Levenberg-Marquardt with
    Cauchy robustification, replacing the Ceres/pybind11 extension
    (``evaluation/frustum_reg/src/registration.cpp``) and its
    8-process x 60-init fan-out (``evaluation/registration_lsq.py:142-186``).
  * :mod:`pnp` — RANSAC PnP over the fine labels
    (``evaluation/registration_pnp.py:95-148``).
  * :mod:`icp` — point-to-point ICP against a pseudo point cloud
    (``evaluation/icp/registration_icp.py:115-162``).
  * :mod:`metrics` — RTE/RRE/success-rate
    (``evaluation/registration_result_analysis.py:37-47``).
"""
from .frustum import (frustum_cost, lm_solve, solve_frustum_batch,
                      initial_guess)
from .metrics import pose_diff, pose_diff_np, registration_summary
