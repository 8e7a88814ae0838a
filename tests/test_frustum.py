"""Frustum LM solver: convergence on synthetic problems with known pose
(the reference's solver oracle check, ``evaluation/test_frustum_solver.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepi2p_tpu.register import (frustum_cost, lm_solve, solve_frustum_batch,
                                  initial_guess, pose_diff, pose_diff_np,
                                  registration_summary)
from deepi2p_tpu.register.frustum import theta_to_pose, rodrigues
from deepi2p_tpu.ops.projection import project_points, coarse_labels

H, W = 160, 512
K_np = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)


def _make_problem(rng, yaw, t, n=1024):
    """Random panoramic cloud + GT labels under pose (yaw about y, t)."""
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 40, n)
    pc = np.stack([r * np.cos(theta),
                   rng.uniform(-2, 2, n),
                   r * np.sin(theta)], axis=-1).astype(np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    P[:3, 3] = t
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K_np[None]))
    labels = np.asarray(coarse_labels(pxpy, z, H, W))[0]
    return pc, labels, P


@pytest.mark.slow  # 104 s measured (tests/.last_durations.json)
def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    for _ in range(5):
        aa = rng.normal(size=3).astype(np.float32)
        got = np.asarray(rodrigues(jnp.asarray(aa)))
        want = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-5)
    # near-zero
    got = np.asarray(rodrigues(jnp.zeros(3)))
    np.testing.assert_allclose(got, np.eye(3), atol=1e-7)


def test_pose_diff_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    for i in range(5):
        Pp = np.eye(4); Pg = np.eye(4)
        Pp[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
        Pp[:3, 3] = rng.normal(size=3)
        Pg[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
        Pg[:3, 3] = rng.normal(size=3)
        rte_j, rre_j = pose_diff(jnp.asarray(Pp[None]), jnp.asarray(Pg[None]))
        rte_n, rre_n = pose_diff_np(Pp, Pg)
        np.testing.assert_allclose(float(rte_j[0]), rte_n, rtol=1e-4)
        np.testing.assert_allclose(float(rre_j[0]), rre_n, rtol=1e-3, atol=1e-3)


def test_cost_zero_at_gt(rng):
    """Perfect labels at the GT pose give (near) zero cost."""
    yaw, t = 0.7, np.array([1.0, 0.0, 2.0], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t)
    theta_gt = jnp.asarray([yaw, *t])
    c = float(frustum_cost(theta_gt, jnp.asarray(pc), jnp.asarray(labels),
                           jnp.ones(len(pc)), jnp.asarray(K_np), H, W))
    assert c < 1e-3


def test_lm_converges_from_perturbed_init(rng):
    """Mirror of evaluation/test_frustum_solver.py:98-117."""
    yaw, t = 0.5, np.array([0.5, 0.0, 1.0], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t)
    theta0 = jnp.asarray([yaw + 0.15, 0.0, 0.0, 0.0])
    res = lm_solve(jnp.asarray(pc), jnp.asarray(labels, jnp.float32),
                   jnp.ones(len(pc)), jnp.asarray(K_np), theta0,
                   jnp.asarray([-5.0, -0.1, -10.0]),
                   jnp.asarray([5.0, 0.1, 10.0]),
                   H=H, W=W, max_iter=64)
    c0 = float(frustum_cost(theta0, jnp.asarray(pc), jnp.asarray(labels),
                            jnp.ones(len(pc)), jnp.asarray(K_np), H, W))
    assert float(res.cost) < c0
    assert int(res.n_accepted) > 0
    P_est = np.asarray(theta_to_pose(res.theta, True))
    rte, rre = pose_diff_np(P_est, np.asarray(P, np.float64))
    assert rre < 5.0, f"rre={rre}"


def test_initial_guess_points_at_insiders(rng):
    yaw = 1.2
    pc, labels, _ = _make_problem(rng, yaw, np.zeros(3, np.float32))
    ang, valid = initial_guess(jnp.asarray(pc), jnp.asarray(labels))
    assert 0.0 < float(np.mean(np.asarray(valid))) <= 1.0
    # rotating by the guess should place insiders in front (positive z)
    a = float(ang)
    c, s = np.cos(a), np.sin(a)
    rot_z = -s * pc[:, 0] + c * pc[:, 2]
    assert np.mean(rot_z[labels == 1] > 0) > 0.9


def test_solve_frustum_batch_end_to_end(rng):
    """Full multi-init harness recovers yaw-only poses: success by the
    reference criterion RTE<2m, RRE<5deg on clean labels."""
    B = 3
    pcs, labs, Ps = [], [], []
    for b in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)], np.float32)
        pc, labels, P = _make_problem(rng, yaw, t)
        pcs.append(pc); labs.append(labels); Ps.append(P)
    pc = jnp.asarray(np.stack(pcs))
    labels = jnp.asarray(np.stack(labs))
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))

    P_pred, cost = solve_frustum_batch(pc, labels, K, H=H, W=W,
                                       rng=jax.random.PRNGKey(0),
                                       n_inits=16, max_iter=64)
    rtes, rres = [], []
    for b in range(B):
        rte, rre = pose_diff_np(np.asarray(P_pred[b], np.float64),
                                np.asarray(Ps[b], np.float64))
        rtes.append(rte); rres.append(rre)
    summ = registration_summary(np.asarray(rtes), np.asarray(rres))
    assert summ["success_rate"] >= 2.0 / 3.0, (summ, rtes, rres)


def test_solver_survivor_knob(rng):
    """`survivors` shrinks the halving graduate set without losing the
    clean-label recovery guarantee (the bench runs survivors=8 by
    default); `probe_stride=None` auto-adapts to solver_stride."""
    yaw, t = 0.8, np.array([1.0, 0.0, -1.5], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t, n=2048)
    pcb = jnp.asarray(pc[None])
    labb = jnp.asarray(labels[None])
    K = jnp.asarray(K_np[None])
    P_pred, cost = solve_frustum_batch(pcb, labb, K, H=H, W=W,
                                       rng=jax.random.PRNGKey(0),
                                       n_inits=16, max_iter=32,
                                       solver_stride=2, survivors=4,
                                       probe_stride=None)
    rte, rre = pose_diff_np(np.asarray(P_pred[0], np.float64),
                            np.asarray(P, np.float64))
    assert rte < 2.0 and rre < 5.0, (rte, rre)


def test_solve_frustum_batch_no_insiders_fallback(rng):
    pc = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    labels = jnp.zeros((1, 64), jnp.int32)
    K = jnp.asarray(K_np[None])
    P_pred, cost = solve_frustum_batch(pc, labels, K, H=H, W=W,
                                       rng=jax.random.PRNGKey(0), n_inits=4,
                                       max_iter=8)
    np.testing.assert_array_equal(np.asarray(P_pred[0]), np.eye(4))
    assert float(cost[0]) == 1e4


def test_solver_stride_preserves_quality(rng):
    """stride-2/4 subsampling must not change success on clean problems."""
    B = 2
    pcs, labs, Ps = [], [], []
    for b in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)], np.float32)
        pc, labels, P = _make_problem(rng, yaw, t, n=4096)
        pcs.append(pc); labs.append(labels); Ps.append(P)
    pc = jnp.asarray(np.stack(pcs))
    labels = jnp.asarray(np.stack(labs))
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
    for stride in (2, 4):
        P_pred, cost = solve_frustum_batch(pc, labels, K, H=H, W=W,
                                           rng=jax.random.PRNGKey(0),
                                           n_inits=16, max_iter=64,
                                           solver_stride=stride)
        for b in range(B):
            rte, rre = pose_diff_np(np.asarray(P_pred[b], np.float64),
                                    np.asarray(Ps[b], np.float64))
            assert rte < 2.0 and rre < 5.0, (stride, b, rte, rre)


def test_bench_config_quality_gate(rng):
    """Quality gate for the benchmark's solver config (VERDICT r1 weak #8):
    at the quality-first settings bench.py advertises (max_iter=24,
    stride=1, noisy labels), fixed-seed synthetic problems must keep a high
    success rate — a perf tweak that silently degrades the solver fails
    here, not in a driver-recorded bench number."""
    B = 6
    pcs, labs, Ps = [], [], []
    for b in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)], np.float32)
        pc, labels, P = _make_problem(rng, yaw, t, n=4096)
        flip = rng.uniform(size=len(labels)) < 0.10     # 10% label noise
        labels = np.where(flip, 1 - labels, labels)
        pcs.append(pc); labs.append(labels); Ps.append(P)
    pc = jnp.asarray(np.stack(pcs))
    labels = jnp.asarray(np.stack(labs).astype(np.float32))
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
    P_pred, cost = solve_frustum_batch(pc, labels, K, H=H, W=W,
                                       rng=jax.random.PRNGKey(0),
                                       n_inits=64, max_iter=24,
                                       solver_stride=2)
    ok = 0
    for b in range(B):
        rte, rre = pose_diff_np(np.asarray(P_pred[b], np.float64),
                                np.asarray(Ps[b], np.float64))
        ok += (rte < 2.0 and rre < 5.0)
    # measured 5/6 at this seed at stride 1 AND stride 2 (the miss is
    # RTE=2.09 m, noise-limited — its cost minimum under 10% flipped labels
    # is genuinely off-pose); bench-scale evidence: perf_probe8.py 32/32
    assert ok >= 5, f"success {ok}/{B} below gate at bench config"


def test_point_weights_generic_path(rng):
    """Per-point confidence weights (round-5 conversion lever):
    (a) all-ones weights reproduce the unweighted generic solve exactly;
    (b) zeroing the flipped labels' blocks recovers the pose a 20% flip
    rate otherwise breaks."""
    yaw, t = 0.7, np.array([1.0, 0.0, -2.0], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t, n=1024)
    flip = rng.random(1024) < 0.2
    noisy = np.where(flip, 1 - labels, labels).astype(np.float32)

    pcb = jnp.asarray(pc[None])
    labb = jnp.asarray(noisy[None])
    Kb = jnp.asarray(K_np[None])
    kw = dict(H=H, W=W, n_inits=8, max_iter=24,
              rng=jax.random.PRNGKey(3))

    P_a, cost_a = solve_frustum_batch(pcb, labb, Kb, backend="generic",
                                      **kw)
    P_b, cost_b = solve_frustum_batch(
        pcb, labb, Kb, point_weights=jnp.ones((1, 1024)), **kw)
    np.testing.assert_allclose(np.asarray(P_a), np.asarray(P_b), atol=1e-5)
    np.testing.assert_allclose(float(cost_a[0]), float(cost_b[0]),
                               rtol=1e-5)

    # oracle weights: zero exactly the flipped blocks -> the remaining
    # 80% clean labels dominate and the solve lands on the true pose
    w = jnp.asarray((~flip).astype(np.float32)[None])
    P_c, _ = solve_frustum_batch(pcb, labb, Kb, point_weights=w, **kw)
    rte, rre = pose_diff_np(np.asarray(P_c[0], np.float64),
                            P.astype(np.float64))
    assert rte < 2.0 and rre < 5.0, (rte, rre)


@pytest.mark.slow  # 97 s measured (tests/.last_durations.json)
def test_edge_margin_semantics(rng):
    """edge_margin_px (round-5 conversion lever): the margin flattens the
    cost exactly in a band around the frame edges.
    (a) m=0 equals the reference cost bit-for-bit;
    (b) an inside-labelled point projecting <m px outside the frame has
        zero residual under margin m (and nonzero under m=0), and an
        outside-labelled point <m px inside the frame likewise;
    (c) the generic batch solve still recovers a clean-label pose with a
        moderate margin (the basin grows, the minimiser stays inside)."""
    yaw, t = 0.7, np.array([1.0, 0.0, 2.0], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t)
    args = (jnp.asarray(pc), jnp.asarray(labels, jnp.float32),
            jnp.ones(len(pc)), jnp.asarray(K_np), H, W)
    theta_gt = jnp.asarray([yaw, *t])
    c_ref = float(frustum_cost(theta_gt, *args))
    c_m0 = float(frustum_cost(theta_gt, *args, edge_margin_px=0.0))
    assert c_ref == c_m0

    # hand-built points at a known pose (identity): one projecting 10 px
    # LEFT of the frame labelled inside, one 10 px INSIDE labelled outside
    fx, cx, cy = K_np[0, 0], K_np[0, 2], K_np[1, 2]
    z = 10.0
    x_out = (-10.0 - cx) * z / fx          # px = -10
    x_in = (10.0 - cx) * z / fx            # px = +10
    pts = jnp.asarray([[x_out, 0.0, z], [x_in, 0.0, z]], jnp.float32)
    labs = jnp.asarray([1.0, 0.0])
    val = jnp.ones(2)
    theta_id = jnp.zeros(4)
    c_tight = float(frustum_cost(theta_id, pts, labs, val,
                                 jnp.asarray(K_np), H, W))
    c_wide = float(frustum_cost(theta_id, pts, labs, val,
                                jnp.asarray(K_np), H, W,
                                edge_margin_px=12.0))
    assert c_tight > 1.0 and c_wide == 0.0, (c_tight, c_wide)

    # (c) end-to-end with margin: clean labels still register
    P_pred, _ = solve_frustum_batch(
        jnp.asarray(pc[None]), jnp.asarray(labels[None]),
        jnp.asarray(K_np[None]), H=H, W=W, n_inits=16, max_iter=64,
        rng=jax.random.PRNGKey(5), edge_margin_px=8.0)
    rte, rre = pose_diff_np(np.asarray(P_pred[0], np.float64),
                            P.astype(np.float64))
    assert rte < 2.0 and rre < 5.0, (rte, rre)


def test_bench_config_quality_gate_real_structure(rng):
    """Re-pinned gate (VERDICT r3 #6): replay the MEASURED error
    structure of a real prediction dump — border-band + off-band rates
    from ``tests/fixtures/error_structure.json``
    (``scripts/characterize_errors.py``) — through the border-band noise
    model at the bench solver config.  Unlike the 10%-iid gate above,
    this pins the bench knobs against the spatially-coherent error
    geometry the trained classifier actually produces."""
    import json, os
    fix_path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "error_structure.json")
    # the fixture is COMMITTED (VERDICT r4 #7): a missing file means a
    # broken checkout or an accidental deletion — fail, never skip, so
    # the bench knobs cannot silently lose their quality gate
    assert os.path.isfile(fix_path), (
        "tests/fixtures/error_structure.json missing — it is a committed "
        "artifact (regenerate with scripts/characterize_errors.py on a "
        "real dump)")
    with open(fix_path) as f:
        fix = json.load(f)
    from deepi2p_tpu.register.noise import flip_border_band, flip_iid
    B = 6
    pcs, labs, Ps = [], [], []
    for b in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)],
                     np.float32)
        pc, labels, P = _make_problem(rng, yaw, t, n=4096)
        # the dump was measured at its training geometry; the band model
        # transfers by pixel distance, so reuse this file's H/W camera
        labels = flip_border_band(rng, labels, pc, P, K_np, H, W,
                                  band_px=fix["band_px"],
                                  rate=fix["band_error_rate"])
        labels = flip_iid(rng, labels, fix["offband_error_rate"])
        pcs.append(pc); labs.append(labels); Ps.append(P)
    P_pred, cost = solve_frustum_batch(
        jnp.asarray(np.stack(pcs)),
        jnp.asarray(np.stack(labs).astype(np.float32)),
        jnp.asarray(np.tile(K_np, (B, 1, 1))), H=H, W=W,
        rng=jax.random.PRNGKey(0), n_inits=64, max_iter=24,
        solver_stride=2)
    ok = 0
    for b in range(B):
        rte, rre = pose_diff_np(np.asarray(P_pred[b], np.float64),
                                np.asarray(Ps[b], np.float64))
        ok += (rte < 2.0 and rre < 5.0)
    assert ok >= fix.get("gate_min_success", 4), \
        f"success {ok}/{B} below gate at measured error structure"


def test_solver_3d_mode(rng):
    """6-parameter (angle-axis + t) mode, parity with registration_3d.hpp.

    Frustum-only registration is weakly observable in pitch/roll (which is
    why the reference evaluates with ``is_2d=True``,
    ``registration_lsq.py:264``); assert convergence and bounded error
    rather than tight recovery.
    """
    yaw, t = 0.4, np.array([0.3, 0.0, 0.8], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t)
    theta0 = jnp.asarray([0.0, yaw + 0.1, 0.0, 0.0, 0.0, 0.3])
    res = lm_solve(jnp.asarray(pc), jnp.asarray(labels, jnp.float32),
                   jnp.ones(len(pc)), jnp.asarray(K_np), theta0,
                   jnp.asarray([-5.0, -1.0, -10.0]),
                   jnp.asarray([5.0, 1.0, 10.0]),
                   H=H, W=W, max_iter=64, is_2d=False)
    c0 = float(frustum_cost(theta0, jnp.asarray(pc), jnp.asarray(labels),
                            jnp.ones(len(pc)), jnp.asarray(K_np), H, W,
                            is_2d=False))
    assert float(res.cost) < c0
    assert int(res.n_accepted) > 0
    P_est = np.asarray(theta_to_pose(res.theta, False))
    rte, rre = pose_diff_np(P_est.astype(np.float64),
                            np.asarray(P, np.float64))
    assert rte < 2.0 and rre < 30.0, (rte, rre)

    # batched harness in 3D mode uses the autodiff path
    P_pred, cost = solve_frustum_batch(
        jnp.asarray(pc[None]), jnp.asarray(labels[None]),
        jnp.asarray(K_np[None]), H=H, W=W, rng=jax.random.PRNGKey(0),
        n_inits=8, max_iter=32, is_2d=False,
        t_lb=(-5.0, -1.0, -10.0), t_ub=(5.0, 1.0, 10.0))
    assert np.isfinite(float(cost[0]))


def test_structured_noise_gate(rng):
    """Clustered-noise quality gate (VERDICT r2 weak #4): the i.i.d. noise
    of the original gate is friendly — real classifier errors cluster
    (whole angular sectors, frustum-border bands).  CPU bisect at N=4096
    (round 3): under 3/32 flipped sectors (~9% marginal rate) the lossy
    bench knob is solver_stride (stride2: 3/8, stride1: 5/8 at 64 inits,
    24 iters; generous budget 6/8 — the rest is noise-limited).  Gate the
    stride-1 config; bench-scale numbers live in
    scripts/quality_table_structured.py output (BENCH_NOTES round 3)."""
    from deepi2p_tpu.register.noise import flip_sectors

    B = 8
    rng = np.random.default_rng(11)
    pcs, labs, Ps = [], [], []
    for b in range(B):
        yaw = rng.uniform(-np.pi, np.pi)
        t = np.array([rng.uniform(-2, 2), 0.0, rng.uniform(-2, 2)],
                     np.float32)
        pc, labels, P = _make_problem(rng, yaw, t, n=4096)
        labels = flip_sectors(rng, pc, labels, n_sectors=32, n_flipped=3)
        pcs.append(pc); labs.append(labels); Ps.append(P)
    pc = jnp.asarray(np.stack(pcs))
    labels = jnp.asarray(np.stack(labs).astype(np.float32))
    K = jnp.asarray(np.tile(K_np, (B, 1, 1)))
    P_pred, _ = solve_frustum_batch(pc, labels, K, H=H, W=W,
                                    rng=jax.random.PRNGKey(0),
                                    n_inits=64, max_iter=24,
                                    solver_stride=1)
    ok = 0
    for b in range(B):
        rte, rre = pose_diff_np(np.asarray(P_pred[b], np.float64),
                                np.asarray(Ps[b], np.float64))
        ok += (rte < 2.0 and rre < 5.0)
    # measured 5/8 at this seed (stride 1); >=4 leaves cross-backend slack
    assert ok >= 4, f"success {ok}/{B} under sector noise at stride 1"


def test_noise_models_sane(rng):
    """Structured corruption models: marginal rates in the expected band,
    errors actually clustered (sector), concentrated at the frustum edge
    (border)."""
    from deepi2p_tpu.register.noise import (flip_iid, flip_sectors,
                                            flip_border_band, error_rate)

    rng = np.random.default_rng(3)
    yaw, t = 0.4, np.array([1.0, 0.0, -1.0], np.float32)
    pc, labels, P = _make_problem(rng, yaw, t, n=8192)

    iid = flip_iid(rng, labels, 0.10)
    assert 0.07 < error_rate(labels, iid) < 0.13

    sec = flip_sectors(rng, pc, labels, n_sectors=32, n_flipped=3)
    r = error_rate(labels, sec)
    assert 0.04 < r < 0.15
    # clustered: flipped points live in exactly 3 of 32 azimuth sectors
    az = np.arctan2(pc[:, 0], pc[:, 2])
    sector = ((az + np.pi) / (2 * np.pi) * 32).astype(int) % 32
    assert len(np.unique(sector[labels != sec])) == 3

    bor = flip_border_band(rng, labels, pc, P, K_np, H, W,
                           band_px=40.0, rate=0.5)
    changed = labels != bor
    assert changed.sum() > 20
    # every flipped point projects within the band around the image rect
    R_, t_ = P[:3, :3], P[:3, 3]
    cam = pc[changed] @ R_.T + t_
    px = K_np[0, 0] * cam[:, 0] / cam[:, 2] + K_np[0, 2]
    py = K_np[1, 1] * cam[:, 1] / cam[:, 2] + K_np[1, 2]
    dx = np.maximum(-px, px - (W - 1))
    dy = np.maximum(-py, py - (H - 1))
    d = np.where((dx <= 0) & (dy <= 0), np.maximum(dx, dy),
                 np.hypot(np.maximum(dx, 0), np.maximum(dy, 0)))
    assert (np.abs(d) < 40.0).all()
