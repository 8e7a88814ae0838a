"""Oxford offline builder: fake-traversal end-to-end + SE(3) math oracles.

Builds a synthetic RobotCar traversal (fake VO csv + fake LMS .bin scans +
fake camera pngs), runs :func:`build_traversal`, and loads the result with
:class:`OxfordLoader` — the full offline->online handshake of
``data/oxford/build_dataset.py`` -> ``data/oxford_pc_img_pose_loader.py``.
"""
import os

import numpy as np
import pytest

from deepi2p_tpu import config
from deepi2p_tpu.data.prep.oxford_prep import (
    SdkInterface, VOManager, build_dataset, build_se3_transform,
    build_traversal, downsample, interpolate_poses, load_lms_scan,
    sdk_from_extrinsics)
from deepi2p_tpu.data.oxford import OxfordLoader


# --------------------------------------------------------------------------
# SE(3) math oracles
# --------------------------------------------------------------------------

def test_build_se3_transform_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    for _ in range(10):
        xyzrpy = rng.uniform(-2, 2, 6)
        T = build_se3_transform(xyzrpy)
        # SDK convention: R = Rz(yaw) Ry(pitch) Rx(roll) == extrinsic 'xyz'
        want = Rotation.from_euler("xyz", xyzrpy[3:]).as_matrix()
        np.testing.assert_allclose(T[:3, :3], want, atol=1e-10)
        np.testing.assert_allclose(T[:3, 3], xyzrpy[:3], atol=1e-12)


def test_interpolate_poses_midpoint():
    from scipy.spatial.transform import Rotation
    P0 = np.eye(4)
    P1 = build_se3_transform([2.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2])
    out = interpolate_poses([0, 100], [P0, P1], [50], 0)
    want_R = Rotation.from_euler("z", np.pi / 4).as_matrix()
    np.testing.assert_allclose(out[0][:3, :3], want_R, atol=1e-7)
    np.testing.assert_allclose(out[0][:3, 3], [1.0, 0.0, 0.0], atol=1e-7)
    # origin re-expression: relative to the pose at ts=100 the pose at
    # ts=100 is identity
    rel = interpolate_poses([0, 100], [P0, P1], [100], 100)
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-7)


# --------------------------------------------------------------------------
# fake traversal
# --------------------------------------------------------------------------

US = 1_000_000            # microseconds per second
SPEED = 10.0              # m/s along +x
T_TOTAL = 6.0             # seconds of driving


def _make_fake_traversal(root, lms_root, trav, rng, tags=("sunny",)):
    """Vehicle drives +x at 10 m/s; LMS at 50 Hz, camera+VO at 10 Hz."""
    tdir = os.path.join(root, trav)
    os.makedirs(os.path.join(tdir, "vo"))
    os.makedirs(os.path.join(tdir, "stereo", "centre"))
    ldir = os.path.join(lms_root, trav, "lms_front")
    os.makedirs(ldir)

    # VO csv: header + rows (dest_ts, src_ts, x, y, z, r, p, yaw) @10 Hz
    n_vo = int(T_TOTAL * 10)
    with open(os.path.join(tdir, "vo", "vo.csv"), "w") as f:
        f.write("source_timestamp,destination_timestamp,x,y,z,roll,pitch,yaw\n")
        for i in range(1, n_vo + 1):
            f.write(f"{i * US // 10},{(i - 1) * US // 10},"
                    f"{SPEED / 10},0,0,0,0,0\n")

    # camera timestamps @10 Hz + dummy pngs
    cam_ts = [i * US // 10 for i in range(n_vo + 1)]
    with open(os.path.join(tdir, "stereo", "stereo.timestamps"), "w") as f:
        for ts in cam_ts:
            f.write(f"{ts} 1\n")
    for ts in cam_ts:
        open(os.path.join(tdir, "stereo", "centre", f"{ts}.png"), "wb").close()

    # LMS scans @50 Hz: ~60 pts each, x (down) in [-2, 0.5], y lateral
    lms_ts = [i * US // 50 for i in range(int(T_TOTAL * 50) + 1)]
    with open(os.path.join(lms_root, trav, "lms_front.timestamps"), "w") as f:
        for ts in lms_ts:
            f.write(f"{ts} 1\n")
    for ts in lms_ts:
        n = 60
        scan = np.stack([rng.uniform(-2.0, 0.5, n),       # x: down
                         rng.uniform(-10.0, 10.0, n),     # y: lateral
                         rng.uniform(0.0, 255.0, n)],     # reflectance
                        axis=1).astype(np.double)
        scan.tofile(os.path.join(ldir, f"{ts}.bin"))

    with open(os.path.join(tdir, "tags.csv"), "w") as f:
        f.write(",".join(tags) + "\n")
    return cam_ts, lms_ts


def _fake_sdk(rng):
    img = rng.integers(0, 255, size=(160, 240, 3)).astype(np.uint8)
    return SdkInterface(load_image=lambda path: img)


BUILD_KW = dict(remove_ground_threshold=0.1, pc_sample_distance=2.0,
                min_vehicle_velocity=0.2, accumulation_distance=20.0,
                ignore_first_n_second=0.5, voxel_grid_downsample_size=0.1)


@pytest.fixture
def fake_traversal(tmp_path, rng):
    raw = str(tmp_path / "raw")
    lms = str(tmp_path / "lms")
    out = str(tmp_path / "out")
    _make_fake_traversal(raw, lms, "2015-01-01-00-00-00", rng)
    return raw, lms, out


def test_build_traversal_end_to_end(fake_traversal, rng):
    raw, lms, out = fake_traversal
    trav = "2015-01-01-00-00-00"
    summary = build_traversal(trav, lms, raw, out, _fake_sdk(rng),
                              **BUILD_KW)
    assert summary["n_pc"] >= 3, summary
    assert summary["n_img"] > 30, summary

    tdir = os.path.join(out, trav)
    pc_ts = np.load(os.path.join(tdir, "pc_timestamps.npy"))
    pc_poses = np.load(os.path.join(tdir, "pc_poses.npy"))
    cam_ts = np.load(os.path.join(tdir, "camera_timestamps.npy"))
    cam_poses = np.load(os.path.join(tdir, "camera_poses.npy"))
    assert pc_poses.shape == (len(pc_ts), 4, 4)
    assert cam_poses.shape == (len(cam_ts), 4, 4)

    # poses integrate the +x motion: consecutive pc nodes ~2 m apart
    gaps = np.linalg.norm(np.diff(pc_poses[:, :3, 3], axis=0), axis=1)
    np.testing.assert_allclose(gaps, 2.0, atol=0.3)

    # clouds: 4xN float32, reflectance in range
    cloud = np.load(os.path.join(tdir, "lms_front", f"{pc_ts[0]}.npy"))
    assert cloud.dtype == np.float32 and cloud.shape[0] == 4
    assert cloud.shape[1] > 500
    assert 0.0 <= cloud[3].min() and cloud[3].max() <= 255.0
    # the accumulation window spreads points ~accumulation_distance along
    # the +x motion axis (scan-local x is only [-2, 0.5])
    spread = cloud[0].max() - cloud[0].min()
    assert 15.0 < spread < 25.0

    # ground removal: a single-scan window at its own origin stays in the
    # scan frame (pose ~ identity) => x (down) must be < threshold
    from deepi2p_tpu.data.prep.oxford_prep import (VOManager,
                                                   build_pointcloud_window)
    vo = VOManager(os.path.join(raw, trav, "vo", "vo.csv"))
    lms_ts = [int(line.split()[0]) for line in
              open(os.path.join(lms, trav, "lms_front.timestamps"))]
    one, refl, _ = build_pointcloud_window(
        np.eye(4), os.path.join(lms, trav, "lms_front"), vo,
        [lms_ts[50]], lms_ts[50], remove_ground_threshold=0.1)
    assert one[0].max() < 0.1 + 1e-9
    assert one.shape[1] < 60                     # some ground points dropped

    # decoded images exist as jpgs
    assert os.path.isfile(os.path.join(tdir, "stereo", "centre",
                                       f"{cam_ts[0]}.jpg"))


def test_build_traversal_resumes(fake_traversal, rng):
    raw, lms, out = fake_traversal
    trav = "2015-01-01-00-00-00"
    s1 = build_traversal(trav, lms, raw, out, _fake_sdk(rng), **BUILD_KW)
    first = os.path.join(out, trav, "lms_front",
                         f"{np.load(os.path.join(out, trav, 'pc_timestamps.npy'))[0]}.npy")
    mtime = os.path.getmtime(first)
    s2 = build_traversal(trav, lms, raw, out, _fake_sdk(rng), **BUILD_KW)
    assert s1 == s2
    assert os.path.getmtime(first) == mtime      # not rebuilt


def test_build_traversal_feeds_loader(fake_traversal, rng):
    raw, lms, out = fake_traversal
    trav = "2015-01-01-00-00-00"
    build_traversal(trav, lms, raw, out, _fake_sdk(rng), **BUILD_KW)
    with open(os.path.join(out, "train.txt"), "w") as f:
        f.write(trav + "\n")
    with open(os.path.join(out, "val.txt"), "w") as f:
        f.write(trav + "\n")

    cfg = config.tiny().replace(translation_max=25.0, test_translation_max=25.0)
    loader = OxfordLoader(out, "train", cfg, seed=0)
    assert len(loader) >= 3
    s = loader[0]
    assert s["pc"].shape == (cfg.input_pt_num, 3)
    assert s["img"].shape == (cfg.img_H, cfg.img_W, 3)
    assert s["node_a"].shape == (cfg.node_a_num, 3)
    assert s["P"].shape == (3, 4)
    assert np.isfinite(s["pc"]).all() and np.isfinite(s["P"]).all()


def test_build_dataset_night_filter_and_done_skip(tmp_path, rng):
    raw = str(tmp_path / "raw")
    lms = str(tmp_path / "lms")
    out = str(tmp_path / "out")
    _make_fake_traversal(raw, lms, "day-trav", rng, tags=("sunny",))
    _make_fake_traversal(raw, lms, "night-trav", rng, tags=("night",))
    built = build_dataset(lms, raw, out, _fake_sdk(rng), **BUILD_KW)
    assert built == ["day-trav"]
    assert not os.path.exists(os.path.join(out, "night-trav",
                                           "pc_timestamps.npy"))
    # done-detection: tags.csv copied => second run builds nothing
    assert os.path.isfile(os.path.join(out, "day-trav", "tags.csv"))
    assert build_dataset(lms, raw, out, _fake_sdk(rng), **BUILD_KW) == []


def test_sdk_from_extrinsics(tmp_path, rng):
    ext = tmp_path / "extrinsics"
    ext.mkdir()
    (ext / "stereo.txt").write_text("0.1 0.2 0.3 0 0 0\n")
    (ext / "lms_front.txt").write_text("1 0 0.5 0 0 1.5708\n")
    sdk = sdk_from_extrinsics(str(ext), load_image=lambda p: None)
    np.testing.assert_allclose(sdk.G_camera_vehicle[:3, 3], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(sdk.G_posesource_laser[0, 1], -1.0, atol=1e-4)


def test_downsample_preserves_reflectance_range(rng):
    pts = rng.uniform(-5, 5, size=(4, 2000))
    pts[3] = 1.0
    refl = rng.uniform(10, 20, 2000)
    cloud, r = downsample(pts, refl, 0.5)
    assert cloud.shape[0] == 4 and cloud.shape[1] < 2000
    assert r.shape == (cloud.shape[1],)
    assert r.min() >= 10 - 1e-6 and r.max() <= 20 + 1e-6


# --------------------------------------------------------------------------
# first-principles image decode (oxford_image.py; the reference delegates
# to the robotcar SDK's demosaic + LUT undistort, build_dataset.py:356-378)
# --------------------------------------------------------------------------

def _mosaic(rgb, pattern):
    """Synthetically Bayer-mosaic an RGB image."""
    H, W, _ = rgb.shape
    raw = np.zeros((H, W), np.float32)
    for idx, ch in enumerate(pattern):
        r, c = divmod(idx, 2)
        raw[r::2, c::2] = rgb[r::2, c::2, "rgb".index(ch)]
    return raw


def test_demosaic_golden_smooth_image(rng):
    """On a smooth image, bilinear demosaic of its own mosaic recovers it
    (away from borders) to within interpolation error."""
    from deepi2p_tpu.data.prep.oxford_image import demosaic

    H, W = 64, 80
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.stack([100 + 50 * np.sin(xx / 17.0),
                    120 + 40 * np.cos(yy / 13.0),
                    90 + 30 * np.sin((xx + yy) / 23.0)], axis=-1)
    for pattern in ("gbrg", "rggb"):
        out = demosaic(_mosaic(rgb, pattern), pattern)
        err = np.abs(out[4:-4, 4:-4] - rgb[4:-4, 4:-4])
        assert err.max() < 2.0, (pattern, err.max())


def test_demosaic_preserves_known_samples(rng):
    from deepi2p_tpu.data.prep.oxford_image import demosaic

    raw = rng.integers(0, 255, (32, 32)).astype(np.float32)
    out = demosaic(raw, "gbrg")
    # gbrg: G at (0,0) and (1,1); B at (0,1); R at (1,0) of each 2x2 tile
    np.testing.assert_array_equal(out[0::2, 0::2, 1], raw[0::2, 0::2])
    np.testing.assert_array_equal(out[1::2, 1::2, 1], raw[1::2, 1::2])
    np.testing.assert_array_equal(out[0::2, 1::2, 2], raw[0::2, 1::2])
    np.testing.assert_array_equal(out[1::2, 0::2, 0], raw[1::2, 0::2])


def test_undistort_lut_roundtrip(tmp_path, rng):
    """Identity LUT reproduces the image; an integer-shift LUT shifts it —
    the SDK's map_coordinates(order=1) semantics."""
    from deepi2p_tpu.data.prep.oxford_image import (read_distortion_lut,
                                                    undistort)

    H, W = 24, 30
    img = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    lut_path = tmp_path / "identity.bin"
    np.stack([u.ravel(), v.ravel()]).astype(np.double).tofile(lut_path)
    mu, mv = read_distortion_lut(str(lut_path), (H, W))
    np.testing.assert_allclose(undistort(img, mu, mv), img, atol=1e-4)

    shift_path = tmp_path / "shift.bin"
    np.stack([(u + 3).ravel(), v.ravel()]).astype(np.double).tofile(
        shift_path)
    mu, mv = read_distortion_lut(str(shift_path), (H, W))
    out = undistort(img, mu, mv)
    np.testing.assert_allclose(out[:, :-3], img[:, 3:], atol=1e-4)


def test_make_load_image_end_to_end(tmp_path, rng):
    """raw Bayer PNG + LUT file -> decoded RGB via the default
    SdkInterface decoder (no callable injected)."""
    import cv2
    from deepi2p_tpu.data.prep.oxford_image import make_load_image

    H, W = 32, 40
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.stack([100 + 50 * np.sin(xx / 11.0),
                    120 + 40 * np.cos(yy / 7.0),
                    90 + 30 * np.sin((xx + yy) / 13.0)], axis=-1)
    raw = _mosaic(rgb, "gbrg").astype(np.uint8)
    png = str(tmp_path / "t.png")
    assert cv2.imwrite(png, raw)

    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    lut = str(tmp_path / "lut.bin")
    np.stack([u.ravel(), v.ravel()]).astype(np.double).tofile(lut)

    load = make_load_image(lut_path=lut, pattern="gbrg")
    out = load(png)
    assert out.shape == (H, W, 3) and out.dtype == np.uint8
    err = np.abs(out[4:-4, 4:-4].astype(np.float32) -
                 np.clip(rgb[4:-4, 4:-4], 0, 255).astype(np.uint8))
    assert err.max() <= 3.0

    # default sdk_from_extrinsics builds this decoder when none is given
    from deepi2p_tpu.data.prep.oxford_prep import sdk_from_extrinsics
    ext = tmp_path / "extrinsics"; ext.mkdir()
    for name in ("stereo", "lms_front"):
        (ext / f"{name}.txt").write_text("0 0 0 0 0 0\n")
    sdk = sdk_from_extrinsics(str(ext), lut_path=lut)
    out2 = sdk.load_image(png)
    np.testing.assert_array_equal(out, out2)
