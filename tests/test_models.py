"""Shape-parity tests for the networks against the reference channel plan."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model compile / oracle / e2e tier (see pytest.ini)

from deepi2p_tpu import config
from deepi2p_tpu.models import (PointNetMLP, ResNetPyramid, PCEncoder,
                                ImageEncoder, KeypointDetector)


def _pc_inputs(rng, cfg, B=2):
    N, Ma, Mb = cfg.input_pt_num, cfg.node_a_num, cfg.node_b_num
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return (r(B, N, 3), r(B, N, 1), r(B, N, 3), r(B, Ma, 3), r(B, Mb, 3))


def test_pointnet_mlp_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 7)).astype(np.float32))
    m = PointNetMLP([32, 32, 32], norm_act_at_last=True)
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (2, 10, 32)
    # 4-D input (neighbourhood stacks) works too
    x4 = jnp.asarray(rng.normal(size=(2, 5, 4, 7)).astype(np.float32))
    m4 = PointNetMLP([16, 8])
    vs4 = m4.init(jax.random.PRNGKey(0), x4, train=False)
    assert m4.apply(vs4, x4, train=False).shape == (2, 5, 4, 8)


def test_resnet_pyramid_shapes(rng):
    img = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    m = ResNetPyramid()
    vs = m.init(jax.random.PRNGKey(0), img, train=False)
    out = m.apply(vs, img, train=False)
    # /2, /4, /8, /16, /32, global — reference models/resnet.py:195-216
    assert out[0].shape == (1, 32, 48, 64)
    assert out[1].shape == (1, 16, 24, 64)
    assert out[2].shape == (1, 8, 12, 128)
    assert out[3].shape == (1, 4, 6, 256)
    assert out[4].shape == (1, 2, 3, 512)
    assert out[5].shape == (1, 512)


def test_pc_encoder_shapes(rng):
    cfg = config.tiny()
    pc, intensity, sn, node_a, node_b = _pc_inputs(rng, cfg)
    m = PCEncoder(Ca=64, Cb=256, Cg=512, k_interp_point_a=cfg.k_interp_point_a,
                  k_ab=cfg.k_ab)
    vs = m.init(jax.random.PRNGKey(0), pc, intensity, sn, node_a, node_b,
                train=False)
    out = m.apply(vs, pc, intensity, sn, node_a, node_b, train=False)
    B, N, Ma, Mb = 2, cfg.input_pt_num, cfg.node_a_num, cfg.node_b_num
    assert out.pc_centers.shape == (B, N, 3)
    assert out.cluster_mean.shape == (B, Ma, 3)
    assert out.min_k_idx.shape == (B, N, cfg.k_interp_point_a)
    assert out.first_pn_out.shape == (B, N, 32)     # Ca/2, networks_pc.py:21
    assert out.second_pn_out.shape == (B, N, 64)    # Ca, networks_pc.py:28
    assert out.node_a_features.shape == (B, Ma, 64)
    assert out.node_b_features.shape == (B, Mb, 256)
    assert out.global_feature.shape == (B, 512)


def test_detector_shapes_fine_and_coarse(rng):
    cfg = config.tiny()
    pc, intensity, sn, node_a, node_b = _pc_inputs(rng, cfg)
    img = jnp.asarray(
        rng.normal(size=(2, cfg.img_H, cfg.img_W, 3)).astype(np.float32))

    m = KeypointDetector(cfg)
    vs = m.init(jax.random.PRNGKey(0), pc, intensity, sn, node_a, node_b,
                img, train=False)
    coarse, fine = m.apply(vs, pc, intensity, sn, node_a, node_b, img,
                           train=False)
    assert coarse.shape == (2, cfg.input_pt_num, 2)
    assert fine.shape == (2, cfg.input_pt_num, cfg.num_fine_classes)

    cfg_c = cfg.replace(is_fine_resolution=False)
    mc = KeypointDetector(cfg_c)
    vsc = mc.init(jax.random.PRNGKey(0), pc, intensity, sn, node_a, node_b,
                  img, train=False)
    out = mc.apply(vsc, pc, intensity, sn, node_a, node_b, img, train=False)
    assert out.shape == (2, cfg.input_pt_num, 2)


def test_detector_train_mode_mutates_batch_stats(rng):
    cfg = config.tiny()
    pc, intensity, sn, node_a, node_b = _pc_inputs(rng, cfg)
    img = jnp.asarray(
        rng.normal(size=(2, cfg.img_H, cfg.img_W, 3)).astype(np.float32))
    m = KeypointDetector(cfg)
    vs = m.init(jax.random.PRNGKey(0), pc, intensity, sn, node_a, node_b,
                img, train=False)
    (coarse, fine), updates = m.apply(
        vs, pc, intensity, sn, node_a, node_b, img, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
    assert np.all(np.isfinite(np.asarray(coarse)))


def test_resnet_torchvision_parity(rng):
    """Import torch resnet34 weights and compare forward activations."""
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    tm = torchvision.models.resnet34(weights=None)
    tm.eval()
    from deepi2p_tpu.models.resnet import load_torch_resnet_params
    params, stats = load_torch_resnet_params(tm.state_dict())

    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = tm.conv1(xt)
        y = tm.bn1(y); y = tm.relu(y)
        y = tm.maxpool(y)
        y = tm.layer1(y); y = tm.layer2(y); y = tm.layer3(y); y = tm.layer4(y)
        want = y.numpy().transpose(0, 2, 3, 1)

    m = ResNetPyramid()
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(x), train=False)
    got = np.asarray(out[4])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_detector_remat_matches(rng):
    """remat=True must not change outputs (only memory/recompute)."""
    from deepi2p_tpu.train import Engine
    from deepi2p_tpu.data import synthetic_batch
    cfg = config.tiny()
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, seed=0).items()}

    outs = []
    for remat in (False, True):
        eng = Engine(cfg.replace(remat=remat), steps_per_epoch=10)
        state = eng.init_state(jax.random.PRNGKey(0), batch)
        m = eng.eval_step(state, batch)
        outs.append(float(m["loss"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)


def test_activation_and_norm_zoo(rng):
    """Every activation/normalization option runs through the full model
    (reference zoo: models/layers_pc.py:281-295)."""
    base = config.tiny().replace(batch_size=1, input_pt_num=128,
                                 node_a_num=8, node_b_num=8, k_ab=4)
    pc, intensity, sn, node_a, node_b = _pc_inputs(rng, base, B=1)
    img = jnp.asarray(
        rng.normal(size=(1, base.img_H, base.img_W, 3)).astype(np.float32))
    for act in ("relu", "elu", "swish", "leakyrelu", "selu"):
        for norm in ("batch", "instance"):
            cfg = base.replace(activation=act, normalization=norm)
            m = KeypointDetector(cfg)
            vs = m.init(jax.random.PRNGKey(0), pc, intensity, sn,
                        node_a, node_b, img, train=False)
            coarse, fine = m.apply(vs, pc, intensity, sn, node_a, node_b,
                                   img, train=False)
            assert np.all(np.isfinite(np.asarray(coarse))), (act, norm)
