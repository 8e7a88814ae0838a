"""Tests for auxiliary components: extra layers, aux losses, ball query."""
import numpy as np
import jax
import jax.numpy as jnp

from deepi2p_tpu.models.extra_layers import (EMAU, PointResNet,
                                             PointNetFusion, UpConv,
                                             KNNModule)
from deepi2p_tpu.train.aux_losses import (gaussian_kernel_2d, gaussian_smooth,
                                          heatmap_loss, chamfer_loss,
                                          chamfer_loss_prob,
                                          keypoint_on_pc_loss,
                                          img_keypoint_offset_norm_loss)
from deepi2p_tpu.ops.ball_query import ball_query


def test_emau_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 20, 16)).astype(np.float32))
    m = EMAU(channels=16, bases=4, stage_num=2)
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    (out, mu), _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 20, 16)
    assert mu.shape == (2, 4, 16)


def test_point_resnet_and_fusion(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    m = PointResNet([16, 16, 16, 32])
    vs = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(vs, x).shape == (2, 10, 32)

    f = PointNetFusion([16, 16], [32, 8])
    vs = f.init(jax.random.PRNGKey(0), x)
    assert f.apply(vs, x).shape == (2, 10, 8)

    x4 = jnp.asarray(rng.normal(size=(2, 5, 4, 8)).astype(np.float32))
    f2 = PointNetFusion([16, 16], [32, 8], final_pool=True)
    vs = f2.init(jax.random.PRNGKey(0), x4)
    assert f2.apply(vs, x4).shape == (2, 5, 8)


def test_upconv_and_knnmodule(rng):
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    m = UpConv(6, normalization="batch", activation="relu")
    vs = m.init(jax.random.PRNGKey(0), img, train=False)
    assert m.apply(vs, img, train=False).shape == (1, 16, 16, 6)

    coords = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    km = KNNModule([16, 16], k=4)
    vs = km.init(jax.random.PRNGKey(0), coords, feats)
    centers, out = km.apply(vs, coords, feats)
    assert centers.shape == (2, 12, 3) and out.shape == (2, 12, 16)


def test_gaussian_smooth_normalised():
    k = gaussian_kernel_2d(5, 1.0)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    img = jnp.ones((1, 8, 8, 1))
    out = gaussian_smooth(img, 5, 1.0)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_heatmap_loss_zero_at_target(rng):
    kp = jnp.asarray(rng.uniform(2, 12, (1, 3, 2)).astype(np.float32))
    # heatmap == splatted target => loss 0
    _, target = heatmap_loss(jnp.zeros((1, 16, 16, 1)), kp, nms_size=5)
    loss, _ = heatmap_loss(target, kp, nms_size=5)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_chamfer_losses(rng):
    a = jnp.asarray(rng.normal(size=(2, 10, 3)).astype(np.float32))
    total, pure, weighted = chamfer_loss(a, a)
    np.testing.assert_allclose(float(total), 0.0, atol=1e-4)
    sig = jnp.ones((2, 10))
    total_p, pure_p, weighted_p = chamfer_loss_prob(a, a, sig, sig)
    np.testing.assert_allclose(float(pure_p), 0.0, atol=1e-4)
    assert np.isfinite(float(total_p))

    kp = a[:, :4] + 1e-4
    assert float(keypoint_on_pc_loss(kp, a)) < 1e-3


def test_offset_norm_loss():
    off = jnp.asarray([[[0.1, 0.1], [3.0, 0.0]]])
    loss = img_keypoint_offset_norm_loss(off, 1.0, 1.0)
    np.testing.assert_allclose(float(loss), 1.5)  # only the 2nd offset


def test_ball_query_semantics():
    # dist rows engineered: row0 has 2 hits -> cyclic pad; row1 none -> zeros
    dist = jnp.asarray([[[0.5, 9.0, 0.2, 9.0],
                         [9.0, 9.0, 9.0, 9.0],
                         [0.1, 0.2, 0.3, 0.4]]])
    idx = np.asarray(ball_query(dist, radius=1.0, k=3))
    np.testing.assert_array_equal(idx[0, 0], [0, 2, 0])   # cyclic repeat
    np.testing.assert_array_equal(idx[0, 1], [0, 0, 0])   # no hits
    np.testing.assert_array_equal(idx[0, 2], [0, 1, 2])   # first 3 hits


def test_debug_vis(rng):
    from deepi2p_tpu.eval.debug_vis import (solver_trace, trace_figure,
                                            tp_fp_fn_colors)
    from deepi2p_tpu.ops.projection import project_points, coarse_labels
    H, W = 64, 96
    K = np.array([[50.0, 0, 48], [0, 50, 32], [0, 0, 1]], np.float32)
    n = 128
    th = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 20, n)
    pc = np.stack([r * np.cos(th), rng.uniform(-1, 1, n),
                   r * np.sin(th)], -1).astype(np.float32)
    P = np.eye(4, dtype=np.float32)
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K[None]))
    labels = np.asarray(
        __import__("deepi2p_tpu.ops.projection", fromlist=["coarse_labels"])
        .coarse_labels(pxpy, z, H, W))[0]
    costs, poses = solver_trace(pc, labels, K, H=H, W=W,
                                theta0=[0.1, 0, 0, 0.5], n_steps=6)
    assert len(costs) == 6 and costs[-1] <= costs[0] + 1e-6
    img = trace_figure(costs)
    assert img.ndim == 3

    colors = tp_fp_fn_colors(labels, labels)
    assert colors.shape == (n, 3)


def test_vis_overlays(rng):
    from deepi2p_tpu.utils.vis import (classification_overlay,
                                       registration_overlay, grid, plot_pc,
                                       fig_to_np)
    H, W, n = 64, 96, 200
    img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    pxpy = rng.uniform(-20, 110, (n, 2)).astype(np.float32)
    cp = rng.integers(0, 2, n)
    cl = rng.integers(0, 2, n)
    out = classification_overlay(pxpy, cp, cl, img, pad=20)
    assert out.shape == (H + 40, W + 40, 3)

    pc = rng.normal(scale=5, size=(n, 3)).astype(np.float32)
    pc[:, 2] += 10
    K = np.array([[50.0, 0, 48], [0, 50, 32], [0, 0, 1]], np.float32)
    reg = registration_overlay(pc, np.eye(4, dtype=np.float32), K,
                               np.ones(n), img)
    assert reg.shape == img.shape

    g = grid([img, img, img], cols=2)
    assert g.shape == (2 * H, 2 * W, 3)

    import matplotlib
    matplotlib.use("Agg")
    ax = plot_pc(pc, color=cl)
    fig_img = fig_to_np(ax.figure)
    assert fig_img.ndim == 3


def test_query_topk_api(rng):
    from deepi2p_tpu.ops.som import query_topk
    B, N, M, k = 2, 20, 6, 3
    node = jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    mask, row_max, min_idx = query_topk(node, x, M, k)
    assert mask.shape == (B, k * N, M)
    assert row_max.shape == (B, M)
    assert min_idx.shape == (B, k * N)
    # first N entries are the rank-0 (nearest) assignments
    d = np.sum((np.asarray(x)[:, :, None] - np.asarray(node)[:, None]) ** 2,
               axis=-1)
    np.testing.assert_array_equal(np.asarray(min_idx)[:, :N],
                                  np.argmin(d, axis=-1))


def test_conv_module_orders(rng):
    from deepi2p_tpu.models.extra_layers import ConvModule
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    for order in (("conv", "norm", "act"), ("norm", "conv", "act")):
        m = ConvModule(6, order=order)
        vs = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(vs, x, train=False).shape == (1, 8, 8, 6)


def test_wsconv_and_scale(rng):
    from deepi2p_tpu.models.extra_layers import WSConv, Scale
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    m = WSConv(features=6, kernel_size=(3, 3), padding=1)
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    assert y.shape == (1, 8, 8, 6)
    # standardized kernel => output invariant to kernel mean/scale shifts
    s = Scale(init_value=2.0)
    vs2 = s.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(s.apply(vs2, x)),
                               2.0 * np.asarray(x), rtol=1e-6)


def test_crop_pc_with_img(rng):
    from deepi2p_tpu.data.base import crop_pc_with_img
    K = np.array([[50.0, 0, 48], [0, 50, 32], [0, 0, 1]], np.float32)
    pc = np.array([[0.0, 0.0, 5.0], [100.0, 0.0, 1.0]], np.float32)
    extras = [np.array([[1.0], [2.0]], np.float32)]
    out, (e,) = crop_pc_with_img(pc, extras, (64, 96), K)
    assert out.shape[0] == 1 and e[0, 0] == 1.0


def test_knn_fusion_module(rng):
    from deepi2p_tpu.models.extra_layers import KNNFusionModule
    coords = jnp.asarray(rng.normal(size=(2, 12, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    m = KNNFusionModule([16, 16], [32, 16], k=4)
    vs = m.init(jax.random.PRNGKey(0), coords, feats)
    centers, out = m.apply(vs, coords, feats)
    assert centers.shape == (2, 12, 3) and out.shape == (2, 12, 16)


def test_fps_approximate(rng):
    from deepi2p_tpu.ops.sampling import fps_approximate_np
    pc = rng.normal(scale=5, size=(500, 3)).astype(np.float32)
    nodes = fps_approximate_np(pc, 2.0, 32, rng)
    assert nodes.shape == (32, 3)


def test_debug_report_writes_images(rng, tmp_path):
    """End-to-end debug_vis over a fabricated dump directory: trace,
    TP/FP/FN scene and iteration-overlay PNGs are written and the summary
    carries finite RTE/RRE (eval.cli solve --debug-vis path)."""
    import os
    from deepi2p_tpu.eval.debug_vis import debug_report
    from deepi2p_tpu.eval.dump import save_sample_dump
    from deepi2p_tpu.ops.projection import project_points, coarse_labels

    H, W = 64, 96
    K = np.array([[50.0, 0, 48], [0, 50, 32], [0, 0, 1]], np.float32)
    n = 256
    th = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(5, 20, n)
    pc = np.stack([r * np.cos(th), rng.uniform(-1, 1, n),
                   r * np.sin(th)], -1).astype(np.float32)
    P = np.eye(4, dtype=np.float32)
    pxpy, z = project_points(jnp.asarray(pc[None]), jnp.asarray(P[None, :3]),
                             jnp.asarray(K[None]))
    from deepi2p_tpu.ops import projection as proj_mod
    labels = np.asarray(proj_mod.coarse_labels(pxpy, z, H, W))[0]

    dump_dir = str(tmp_path / "dump")
    os.makedirs(dump_dir)
    save_sample_dump(dump_dir, "000000_00", pc=pc, coarse_pred=labels,
                     coarse_label=labels, fine_pred=np.zeros(n),
                     fine_label=np.zeros(n), K=K, P=P[:3])
    np.save(os.path.join(dump_dir, "000000_00_img.npy"),
            rng.uniform(0, 255, (H, W, 3)).astype(np.float32))

    out_dir = str(tmp_path / "vis")
    rep = debug_report(dump_dir, "000000_00", H=H, W=W, out_dir=out_dir,
                       n_steps=6)
    assert np.isfinite(rep["rte"]) and np.isfinite(rep["rre"])
    for suffix in ("_trace.png", "_scene.png", "_overlay.png"):
        f = os.path.join(out_dir, "000000_00" + suffix)
        assert os.path.isfile(f) and os.path.getsize(f) > 1000, f
