"""Reference-checkpoint import: synthesise a torch-style state_dict from the
flax tree's shapes (inverse mapping) and check the converter reproduces the
full parameter structure."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model compile / oracle / e2e tier (see pytest.ini)

from deepi2p_tpu import config
from deepi2p_tpu.models import KeypointDetector
from deepi2p_tpu.models.torch_import import (load_torch_detector,
                                             strip_data_parallel)


def _fake_torch_sd_from_tree(params, stats, rng):
    """Build a reference-style state_dict covering our detector params."""
    sd = {}

    def pn_stack(src_prefix, ptree, stree):
        i = 0
        while f"dense_{i}" in ptree:
            d = ptree[f"dense_{i}"]
            cin, cout = d["kernel"].shape
            sd[f"{src_prefix}.{i}.conv.weight"] = \
                rng.normal(size=(cout, cin, 1)).astype(np.float32)
            sd[f"{src_prefix}.{i}.conv.bias"] = \
                rng.normal(size=(cout,)).astype(np.float32)
            if f"norm_{i}" in ptree:
                for torch_name, _ in (("weight", "scale"), ("bias", "bias")):
                    sd[f"{src_prefix}.{i}.norm.{torch_name}"] = \
                        rng.normal(size=(cout,)).astype(np.float32)
                sd[f"{src_prefix}.{i}.norm.running_mean"] = \
                    np.zeros(cout, np.float32)
                sd[f"{src_prefix}.{i}.norm.running_var"] = \
                    np.ones(cout, np.float32)
            i += 1

    mapping = [
        ("pc_encoder.first_pointnet.layers", ("pc_encoder", "first_pointnet")),
        ("pc_encoder.second_pointnet.layers", ("pc_encoder", "second_pointnet")),
        ("pc_encoder.final_pointnet.layers", ("pc_encoder", "final_pointnet")),
        ("pc_encoder.knnlayer.layers_before", ("pc_encoder", "knn_before")),
        ("pc_encoder.knnlayer.layers_after", ("pc_encoder", "knn_after")),
        ("node_b_attention_pn.layers", ("node_b_attention_pn",)),
        ("node_b_pn.layers", ("node_b_pn",)),
        ("node_a_attention_pn.layers", ("node_a_attention_pn",)),
        ("node_a_pn.layers", ("node_a_pn",)),
        ("per_point_pn.layers", ("per_point_pn",)),
    ]
    for src, dst in mapping:
        node_p, node_s = params, stats
        for k in dst:
            node_p = node_p[k]
            node_s = node_s.get(k, {}) if isinstance(node_s, dict) else {}
        pn_stack(src, node_p, node_s)

    # image backbone in torchvision naming
    def conv_t(kernel):
        return np.transpose(kernel, (3, 2, 0, 1)).astype(np.float32)

    bb = params["img_encoder"]["backbone"]
    sd["img_encoder.backbone.conv1.weight"] = conv_t(np.asarray(bb["conv1"]["kernel"]))
    for name in ("weight", "bias", "running_mean", "running_var"):
        dim = bb["bn1"]["scale"].shape[0]
        sd[f"img_encoder.backbone.bn1.{name}"] = (
            np.ones(dim, np.float32) if "var" in name or name == "weight"
            else np.zeros(dim, np.float32))
    stage_sizes = (3, 4, 6, 3)
    for s, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            blk = bb[f"layer{s + 1}_{b}"]
            pre = f"img_encoder.backbone.layer{s + 1}.{b}"
            for cname in ("conv1", "conv2"):
                sd[f"{pre}.{cname}.weight"] = conv_t(np.asarray(blk[cname]["kernel"]))
            for bname in ("bn1", "bn2"):
                dim = blk[bname]["scale"].shape[0]
                sd[f"{pre}.{bname}.weight"] = np.ones(dim, np.float32)
                sd[f"{pre}.{bname}.bias"] = np.zeros(dim, np.float32)
                sd[f"{pre}.{bname}.running_mean"] = np.zeros(dim, np.float32)
                sd[f"{pre}.{bname}.running_var"] = np.ones(dim, np.float32)
            if "down_conv" in blk:
                sd[f"{pre}.downsample.0.weight"] = conv_t(np.asarray(blk["down_conv"]["kernel"]))
                dim = blk["down_bn"]["scale"].shape[0]
                sd[f"{pre}.downsample.1.weight"] = np.ones(dim, np.float32)
                sd[f"{pre}.downsample.1.bias"] = np.zeros(dim, np.float32)
                sd[f"{pre}.downsample.1.running_mean"] = np.zeros(dim, np.float32)
                sd[f"{pre}.downsample.1.running_var"] = np.ones(dim, np.float32)
    return sd


def test_strip_data_parallel():
    sd = {"module.a": 1, "module.b": 2}
    assert strip_data_parallel(sd) == {"a": 1, "b": 2}
    sd2 = {"a": 1}
    assert strip_data_parallel(sd2) == sd2


def test_torch_checkpoint_import_roundtrip(rng):
    cfg = config.tiny()
    model = KeypointDetector(cfg)
    from deepi2p_tpu.data import synthetic_batch
    b = {k: jnp.asarray(v) for k, v in
         synthetic_batch(cfg, batch_size=1, seed=0).items()}
    variables = model.init(jax.random.PRNGKey(0), b["pc"], b["intensity"],
                           b["sn"], b["node_a"], b["node_b"], b["img"],
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = _fake_torch_sd_from_tree(params, stats, rng)
    got_params, got_stats = load_torch_detector(sd)

    # identical tree structure & shapes to the flax init
    want_shapes = jax.tree.map(lambda x: x.shape, params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, got_params)
    assert want_shapes == got_shapes, "param tree mismatch"
    want_sshapes = jax.tree.map(lambda x: x.shape, stats)
    got_sshapes = jax.tree.map(lambda x: np.asarray(x).shape, got_stats)
    assert want_sshapes == got_sshapes, "batch_stats tree mismatch"

    # imported weights drive a working forward pass
    out = model.apply({"params": got_params, "batch_stats": got_stats},
                      b["pc"], b["intensity"], b["sn"], b["node_a"],
                      b["node_b"], b["img"], train=False)
    coarse, fine = out
    assert np.all(np.isfinite(np.asarray(coarse)))


def test_export_import_roundtrip(rng):
    """export_torch_detector(import(x)) reproduces the flax trees exactly."""
    from deepi2p_tpu.models.torch_import import export_torch_detector
    cfg = config.tiny()
    model = KeypointDetector(cfg)
    from deepi2p_tpu.data import synthetic_batch
    b = {k: jnp.asarray(v) for k, v in
         synthetic_batch(cfg, batch_size=1, seed=0).items()}
    variables = model.init(jax.random.PRNGKey(1), b["pc"], b["intensity"],
                           b["sn"], b["node_a"], b["node_b"], b["img"],
                           train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))

    sd = export_torch_detector(params, stats)
    got_p, got_s = load_torch_detector(sd)

    for (pa, a), (pb, bb) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(got_p)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(a, np.asarray(bb), rtol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
    for (pa, a), (pb, bb) in zip(
            jax.tree_util.tree_flatten_with_path(stats)[0],
            jax.tree_util.tree_flatten_with_path(got_s)[0]):
        np.testing.assert_allclose(a, np.asarray(bb), rtol=1e-6)
