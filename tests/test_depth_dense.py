"""Dense ray-cast GT depth for street scenes (the splat z-buffer leaves
a monodepth net unsupervised on most pixels; the analytic scene makes a
DENSE target computable — the synthetic-world equivalent of the
reference's dense photometric monodepth supervision,
``evaluation/icp/save_depth_map.py:60-102``)."""
import numpy as np

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.data.synthetic import _street_scene, raycast_street_depth

CFG = config.tiny(synthetic_scene="street", input_pt_num=1024)


def test_raycast_agrees_with_splat_depth():
    """At pixels where a point was splatted, the ray-cast surface is never
    materially BEHIND the splatted point, and typically coincides with it.

    The comparison must run in DISPARITY-pixel units ``f*(1/d_ray -
    1/d_splat)``: on a grazing ground plane depth changes by ~z²/(f·y)
    per pixel (metres per pixel at range), so a depth-space tolerance is
    meaningless, while pixel quantization + the 0.05 surface-sampling
    noise give a bounded disparity error.  The invariant is one-sided
    because of splat "see-through": the z-buffer projects ALL points, so
    a far-surface point wins any pixel whose true nearest surface has no
    sample — there the ray-cast is NEARER (the artifact dense targets
    exist to fix) — but the ray can never hit behind a real sampled
    point.  Measured over seeds 0..11: one-sided frac ≥ 0.97, median
    |dd| ≤ 2.5 px (worst seed)."""
    for seed in (5, 11):   # 11 is the measured worst-case scene
        b = synthetic_batch(CFG, batch_size=2, seed=seed, with_depth=True)
        dense = synthetic_batch(CFG, batch_size=2, seed=seed,
                                with_depth=True, dense_depth=True)["depth"]
        splat = b["depth"]
        m = splat > 0
        assert m.sum() > 200
        f = b["K"][0][0, 0]
        dd = f * (1.0 / dense[m] - 1.0 / splat[m])   # >0: ray-cast nearer
        assert float((dd > -2.0).mean()) > 0.95
        assert float(np.median(np.abs(dd))) < 3.0


def test_raycast_dense_and_capped():
    """Every pixel gets a positive depth; scene-exit rays sit exactly at
    the far cap; most of a street image hits real surfaces well inside
    the cap."""
    b = synthetic_batch(CFG, batch_size=2, seed=5, with_depth=True,
                        dense_depth=True)
    d = b["depth"]
    assert d.shape == (2, CFG.img_H, CFG.img_W)
    assert (d > 0.1).all() and (d <= 88.0).all()
    assert float((d < 80.0).mean()) > 0.5
    # splat target on the same scenes is mostly zeros (the sparsity the
    # dense mode exists to fix)
    sparse = synthetic_batch(CFG, batch_size=2, seed=5,
                             with_depth=True)["depth"]
    assert float((sparse > 0).mean()) < 0.5


def test_raycast_geometry_identities():
    """Hand-built pose: camera at origin looking down +z.  The principal
    ray must exit (far cap) or hit a box; a steep downward ray hits the
    ground at y=2 => depth 2/tan ~ 2*f/dv; a sideways ray hits the facade
    at |x| = w => depth w*fx/du."""
    rng = np.random.default_rng(3)
    _, _, _, scene = _street_scene(rng, 512)
    H, W, f = 64, 96, 0.6 * 96
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    P = np.eye(4)[:3]
    d = raycast_street_depth(scene, P, K, H, W)
    # bottom-centre pixel: ray dir (0, dv/f, 1) hits the ground y=2 at
    # s = 2f/dv — an upper bound (a box face could be nearer)
    v, u = H - 1, W // 2
    dv = (v + 0.5 - H / 2)
    s_ground = 2.0 * f / dv
    assert 0.1 < d[v, u] <= s_ground + 1e-6
    # left-centre pixel: ray dir (du/f, 0, 1), du<0, hits facade x=-wl at
    # s = wl*f/|du| (within the z extent here) — again an upper bound
    v, u = H // 2, 0
    du = (u + 0.5 - W / 2)
    s_facade = -scene["wl"] * f / du
    assert s_facade <= scene["zmax"]
    assert 0.1 < d[v, u] <= s_facade + 1e-6


def test_dense_depth_requires_street():
    import pytest
    with pytest.raises(ValueError):
        synthetic_batch(config.tiny(), batch_size=1, seed=0,
                        with_depth=True, dense_depth=True)


def test_pseudo_max_depth_drops_far_pixels(tmp_path):
    """dump_pseudo_pointclouds(max_depth=...) must drop saturated 'sky'
    pixels from the pseudo cloud (they sit past every real surface and
    would poison the ICP target)."""
    from deepi2p_tpu.eval.depth import dump_pseudo_pointclouds
    H, W = 32, 48
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
    depth = np.full((H, W), 10.0, np.float32)
    depth[:8] = 88.0   # saturated band

    def depth_fn(img):
        return depth

    img = np.zeros((H, W, 3), np.float32)
    out = str(tmp_path / "ps")
    dump_pseudo_pointclouds([("a", img)], K, depth_fn, out, stride=4)
    full = np.load(out + "/a_pc.npy")
    dump_pseudo_pointclouds([("a", img)], K, depth_fn, out, stride=4,
                            max_depth=85.0)
    capped = np.load(out + "/a_pc.npy")
    assert full.shape[1] > capped.shape[1] > 0
    assert (capped[2] < 85.0).all() and (full[2] >= 85.0).any()
