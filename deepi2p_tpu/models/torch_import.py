"""Import reference-trained torch checkpoints into the flax detector.

The reference saves ``KeypointDetector`` state_dicts per epoch
(``models/multimodal_classifier.py:263-265``); since the TPU model
replicates its channel plan layer-for-layer, a trained reference checkpoint
can be converted directly — users migrating from the reference keep their
weights.  Handles the DataParallel ``module.`` prefix like
``util/pytorch_helper.py:5-33``.

Name mapping (reference state_dict -> flax param tree):

    pc_encoder.first_pointnet.layers.{i}.conv.weight   (Cout, Cin, 1)
        -> pc_encoder/first_pointnet/dense_{i}/kernel  (Cin, Cout)
    *.layers.{i}.norm.{weight,bias}                    -> norm_{i} scale/bias
    *.layers.{i}.norm.running_{mean,var}               -> batch_stats
    pc_encoder.knnlayer.layers_before.{i}.conv.weight  (Cout, Cin, 1, 1)
        -> pc_encoder/knn_before/dense_{i}/kernel
    img_encoder.backbone.*                             -> resnet mapping
        (see :func:`resnet.load_torch_resnet_params`)
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .resnet import load_torch_resnet_params

# reference module name -> (flax module name, is conv2d-style)
_PN_MAP = {
    "pc_encoder.first_pointnet": ("pc_encoder", "first_pointnet"),
    "pc_encoder.second_pointnet": ("pc_encoder", "second_pointnet"),
    "pc_encoder.final_pointnet": ("pc_encoder", "final_pointnet"),
    "node_b_attention_pn": ("node_b_attention_pn",),
    "node_b_pn": ("node_b_pn",),
    "node_a_attention_pn": ("node_a_attention_pn",),
    "node_a_pn": ("node_a_pn",),
    "per_point_pn": ("per_point_pn",),
}
_KNN_MAP = {
    "pc_encoder.knnlayer.layers_before": ("pc_encoder", "knn_before"),
    "pc_encoder.knnlayer.layers_after": ("pc_encoder", "knn_after"),
}


def strip_data_parallel(sd: Dict) -> Dict:
    """Remove the DataParallel ``module.`` prefix if present
    (``util/pytorch_helper.py:24-33``)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _to_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_torch_detector(state_dict: Dict):
    """torch ``KeypointDetector.state_dict()`` -> (params, batch_stats)."""
    sd = {k: _to_np(v) for k, v in strip_data_parallel(state_dict).items()}
    params: Dict = {}
    stats: Dict = {}

    def convert_stack(src_prefix: str, dst_path: Tuple[str, ...],
                      layer_field: str = "layers"):
        i = 0
        while f"{src_prefix}.{layer_field}.{i}.conv.weight" in sd:
            base = f"{src_prefix}.{layer_field}.{i}"
            w = sd[f"{base}.conv.weight"]
            # Conv1d (Cout, Cin, 1) or Conv2d (Cout, Cin, 1, 1) -> (Cin, Cout)
            kernel = w.reshape(w.shape[0], w.shape[1]).T
            _set(params, dst_path + (f"dense_{i}", "kernel"), kernel)
            _set(params, dst_path + (f"dense_{i}", "bias"),
                 sd[f"{base}.conv.bias"])
            if f"{base}.norm.weight" in sd:
                _set(params, dst_path + (f"norm_{i}", "BatchNorm_0", "scale"),
                     sd[f"{base}.norm.weight"])
                _set(params, dst_path + (f"norm_{i}", "BatchNorm_0", "bias"),
                     sd[f"{base}.norm.bias"])
                _set(stats, dst_path + (f"norm_{i}", "BatchNorm_0", "mean"),
                     sd[f"{base}.norm.running_mean"])
                _set(stats, dst_path + (f"norm_{i}", "BatchNorm_0", "var"),
                     sd[f"{base}.norm.running_var"])
            i += 1

    for src, dst in _PN_MAP.items():
        convert_stack(src, tuple(dst))

    # the knn stacks are bare ModuleLists: 'layers_before.0.conv...'
    def convert_seq(src_prefix: str, dst_path: Tuple[str, ...]):
        i = 0
        while f"{src_prefix}.{i}.conv.weight" in sd:
            base = f"{src_prefix}.{i}"
            w = sd[f"{base}.conv.weight"]
            kernel = w.reshape(w.shape[0], w.shape[1]).T
            _set(params, dst_path + (f"dense_{i}", "kernel"), kernel)
            _set(params, dst_path + (f"dense_{i}", "bias"),
                 sd[f"{base}.conv.bias"])
            if f"{base}.norm.weight" in sd:
                _set(params, dst_path + (f"norm_{i}", "BatchNorm_0", "scale"),
                     sd[f"{base}.norm.weight"])
                _set(params, dst_path + (f"norm_{i}", "BatchNorm_0", "bias"),
                     sd[f"{base}.norm.bias"])
                _set(stats, dst_path + (f"norm_{i}", "BatchNorm_0", "mean"),
                     sd[f"{base}.norm.running_mean"])
                _set(stats, dst_path + (f"norm_{i}", "BatchNorm_0", "var"),
                     sd[f"{base}.norm.running_var"])
            i += 1

    for src, dst in _KNN_MAP.items():
        convert_seq(src, tuple(dst))

    # image tower (torchvision-style names under img_encoder.backbone.)
    backbone_sd = {k[len("img_encoder.backbone."):]: v
                   for k, v in sd.items()
                   if k.startswith("img_encoder.backbone.")}
    if backbone_sd:
        bp, bs = load_torch_resnet_params(backbone_sd)
        _set(params, ("img_encoder", "backbone"), bp)
        _set(stats, ("img_encoder", "backbone"), bs)

    return params, stats


def export_torch_detector(params: Dict, batch_stats: Dict) -> Dict:
    """Inverse of :func:`load_torch_detector`: flax trees -> a torch-style
    ``KeypointDetector.state_dict()`` (numpy values), so TPU-trained weights
    can migrate back to the reference implementation."""
    sd: Dict = {}

    def get(tree, path):
        node = tree
        for p in path:
            if p not in node:
                return None
            node = node[p]
        return node

    def export_stack(dst_prefix: str, src_path: Tuple[str, ...],
                     layer_field: str = "layers"):
        ptree = get(params, src_path)
        stree = get(batch_stats, src_path) or {}
        if ptree is None:
            return
        i = 0
        while f"dense_{i}" in ptree:
            d = ptree[f"dense_{i}"]
            base = (f"{dst_prefix}.{layer_field}.{i}" if layer_field
                    else f"{dst_prefix}.{i}")
            kernel = np.asarray(d["kernel"])            # (Cin, Cout)
            sd[f"{base}.conv.weight"] = kernel.T[:, :, None]
            sd[f"{base}.conv.bias"] = np.asarray(d["bias"])
            if f"norm_{i}" in ptree:
                bn_p = ptree[f"norm_{i}"]["BatchNorm_0"]
                bn_s = stree.get(f"norm_{i}", {}).get("BatchNorm_0", {})
                sd[f"{base}.norm.weight"] = np.asarray(bn_p["scale"])
                sd[f"{base}.norm.bias"] = np.asarray(bn_p["bias"])
                if bn_s:
                    sd[f"{base}.norm.running_mean"] = np.asarray(bn_s["mean"])
                    sd[f"{base}.norm.running_var"] = np.asarray(bn_s["var"])
            i += 1

    for src, dst in _PN_MAP.items():
        export_stack(src, tuple(dst))
    for src, dst in _KNN_MAP.items():
        export_stack(src, tuple(dst), layer_field="")

    # image backbone -> torchvision names
    bb_p = get(params, ("img_encoder", "backbone"))
    bb_s = get(batch_stats, ("img_encoder", "backbone")) or {}
    if bb_p is not None:
        def conv_t(kernel):
            return np.asarray(kernel).transpose(3, 2, 0, 1)

        def bn(dst, p, s):
            sd[f"{dst}.weight"] = np.asarray(p["scale"])
            sd[f"{dst}.bias"] = np.asarray(p["bias"])
            if s:
                sd[f"{dst}.running_mean"] = np.asarray(s["mean"])
                sd[f"{dst}.running_var"] = np.asarray(s["var"])

        pre = "img_encoder.backbone"
        sd[f"{pre}.conv1.weight"] = conv_t(bb_p["conv1"]["kernel"])
        bn(f"{pre}.bn1", bb_p["bn1"], bb_s.get("bn1", {}))
        for stage in range(1, 5):
            b = 0
            while f"layer{stage}_{b}" in bb_p:
                blk_p = bb_p[f"layer{stage}_{b}"]
                blk_s = bb_s.get(f"layer{stage}_{b}", {})
                base = f"{pre}.layer{stage}.{b}"
                for cname in ("conv1", "conv2"):
                    sd[f"{base}.{cname}.weight"] = conv_t(blk_p[cname]["kernel"])
                for bname in ("bn1", "bn2"):
                    bn(f"{base}.{bname}", blk_p[bname], blk_s.get(bname, {}))
                if "down_conv" in blk_p:
                    sd[f"{base}.downsample.0.weight"] = conv_t(
                        blk_p["down_conv"]["kernel"])
                    bn(f"{base}.downsample.1", blk_p["down_bn"],
                       blk_s.get("down_bn", {}))
                b += 1
    return sd
