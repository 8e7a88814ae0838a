"""Data pipeline tests: loaders over tiny fake dataset trees (the reference
ships only __main__ shape walk-throughs; see SURVEY.md §4)."""
import math
import os

import numpy as np
import pytest

from deepi2p_tpu import config
from deepi2p_tpu.data import (OxfordLoader, KittiLoader, NuScenesLoader,
                              BatchLoader, device_prefetch, SyntheticDataset,
                              collate, enu2cam)
from deepi2p_tpu.data.augmentation import (color_jitter, random_transform,
                                           angles_to_rotation, jitter)
from deepi2p_tpu.data.nuscenes import remove_ego_points


CFG = config.tiny().replace(input_pt_num=256, node_a_num=16, node_b_num=16)


def _check_sample(s, cfg):
    assert s["pc"].shape == (cfg.input_pt_num, 3)
    assert s["intensity"].shape == (cfg.input_pt_num, 1)
    assert s["sn"].shape == (cfg.input_pt_num, 3)
    assert s["node_a"].shape == (cfg.node_a_num, 3)
    assert s["node_b"].shape == (cfg.node_b_num, 3)
    assert s["P"].shape == (3, 4)
    assert s["img"].shape == (cfg.img_H, cfg.img_W, 3)
    assert s["K"].shape == (3, 3)
    for v in s.values():
        assert np.all(np.isfinite(v))
        assert v.dtype == np.float32


# --------------------------------------------------------------------------
# augmentation
# --------------------------------------------------------------------------

def test_color_jitter_ranges(rng):
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    out = color_jitter(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_process_image_pre_scaled_equivalence(tmp_path, rng):
    """The reduced-resolution decode path must produce the same crop window
    and intrinsics as full decode + resize (same K, same geometry; pixel
    values differ only by the resampling filter)."""
    import cv2
    from deepi2p_tpu import config
    from deepi2p_tpu.data import base

    cfg = config.Config(dataset="oxford", img_H=96, img_W=128, img_scale=0.5,
                        crop_original_top_rows=20)
    img = rng.integers(0, 255, (400, 512, 3)).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    K0 = np.array([[300.0, 0, 256], [0, 300.0, 200], [0, 0, 1]], np.float32)

    loaded, pre_scaled = base.load_image(path, cfg)
    assert pre_scaled and loaded.shape == (200, 256, 3)

    out_a, K_a = base.process_image(loaded, K0.copy(), cfg, train=False,
                                    rng=np.random.default_rng(0),
                                    pre_scaled=True)
    full = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    out_b, K_b = base.process_image(full, K0.copy(), cfg, train=False,
                                    rng=np.random.default_rng(0),
                                    pre_scaled=False)
    assert out_a.shape == out_b.shape == (cfg.img_H, cfg.img_W, 3)
    np.testing.assert_allclose(K_a, K_b, atol=1e-4)
    # same physical window: images correlate strongly (filters differ)
    a = out_a.astype(np.float64).ravel()
    b = out_b.astype(np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5, corr

    # non-power-of-two scale falls back to full decode
    cfg2 = cfg.replace(img_scale=0.4, img_H=80, img_W=100)
    _, pre2 = base.load_image(path, cfg2)
    assert not pre2


def test_random_transform_rotation_valid(rng):
    P = random_transform(rng, (1, 2, 3), (0.1, math.pi, 0.1))
    R = P[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_angles_to_rotation_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    ang = rng.uniform(-1, 1, 3)
    got = angles_to_rotation(ang)
    want = Rotation.from_euler("xyz", ang).as_matrix()  # Rz@Ry@Rx == extrinsic xyz
    np.testing.assert_allclose(got, want, atol=1e-8)


# --------------------------------------------------------------------------
# oxford
# --------------------------------------------------------------------------

@pytest.fixture
def oxford_root(tmp_path, rng):
    import cv2
    root = tmp_path / "oxford"
    trav = root / "trav0"
    (trav / "lms_front").mkdir(parents=True)
    (trav / "stereo" / "centre").mkdir(parents=True)
    (root / "train.txt").write_text("trav0\n")
    (root / "val.txt").write_text("trav0\n")

    n_pc, n_cam = 6, 24
    pc_ts = np.arange(n_pc) * 1000 + 100
    cam_ts = np.arange(n_cam) * 250 + 50
    np.save(trav / "pc_timestamps.npy", pc_ts)
    np.save(trav / "camera_timestamps.npy", cam_ts)

    def poses(ts):
        out = np.tile(np.eye(4, dtype=np.float32), (len(ts), 1, 1))
        out[:, 0, 3] = np.asarray(ts) * 1e-3  # slow drift along x
        return out
    np.save(trav / "pc_poses.npy", poses(pc_ts))
    np.save(trav / "camera_poses.npy", poses(cam_ts))

    for ts in pc_ts:
        pts = rng.normal(scale=10, size=(4, 500)).astype(np.float32)
        np.save(trav / "lms_front" / f"{ts}.npy", pts)
    img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
    for ts in cam_ts:
        cv2.imwrite(str(trav / "stereo" / "centre" / f"{ts}.jpg"), img)
    return str(root)


def test_oxford_loader_modes(oxford_root):
    for mode in ("train", "val", "val_random_Ry"):
        ld = OxfordLoader(oxford_root, mode, CFG, seed=0)
        assert len(ld) == 6
        _check_sample(ld[0], CFG)


# --------------------------------------------------------------------------
# kitti
# --------------------------------------------------------------------------

@pytest.fixture
def kitti_root(tmp_path, rng):
    root = tmp_path / "kitti"
    n = 86  # SKIP=40 on both ends -> 6 usable frames
    seq = "09"  # val sequence so the loader finds it in 'val' mode
    (root / "calib" / seq).mkdir(parents=True)
    K = [200.0, 0.0, 100.0, 0.0,
         0.0, 200.0, 60.0, 0.0,
         0.0, 0.0, 1.0, 0.0]
    tr = [0.0, -1.0, 0.0, 0.0,
          0.0, 0.0, -1.0, 0.0,
          1.0, 0.0, 0.0, 0.0]  # NWU -> cam-ish extrinsic
    lines = []
    for key in ("P0", "P1", "P2", "P3"):
        lines.append(key + ": " + " ".join(str(v) for v in K))
    lines.append("Tr: " + " ".join(str(v) for v in tr))
    (root / "calib" / seq / "calib.txt").write_text("\n".join(lines) + "\n")

    pcdir = root / "data_odometry_velodyne_NWU" / "sequences" / seq / "voxel0.1-SNr0.6"
    img2 = root / "data_odometry_color_npy" / "sequences" / seq / "image_2"
    img3 = root / "data_odometry_color_npy" / "sequences" / seq / "image_3"
    posedir = root / "poses" / seq
    for d in (pcdir, img2, img3, posedir):
        d.mkdir(parents=True)
    img = rng.integers(0, 255, (200, 300, 3)).astype(np.float32)
    for i in range(n):
        # NWU: x forward — keep points in front of the camera
        pts = np.concatenate([
            rng.uniform(2, 30, (1, 400)),
            rng.uniform(-10, 10, (2, 400)),
            rng.uniform(0, 1, (1, 400)),
            rng.normal(size=(3, 400)),
        ]).astype(np.float32)
        np.save(pcdir / f"{i:06d}.npy", pts)
        np.save(img2 / f"{i:06d}.npy", img)
        np.save(img3 / f"{i:06d}.npy", img)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05 * i
        np.savez(posedir / f"{i:06d}.npz", pose=pose)
    return str(root)


def test_kitti_loader_val_and_train(kitti_root):
    cfg = CFG.replace(accumulation_frame_num=1, accumulation_frame_skip=2,
                      delta_ij_max=5)
    ld = KittiLoader(kitti_root, "val", cfg, seed=0)
    assert len(ld) == 12  # 6 frames x 2 cameras
    s = ld[0]
    _check_sample(s, cfg)
    # geometric sanity: with identity-ish poses some points project inside
    pc_h = np.concatenate([s["pc"], np.ones((cfg.input_pt_num, 1))], axis=1)
    cam = (s["P"] @ pc_h.T)
    px = s["K"] @ cam
    px = px[:2] / px[2:]
    inside = ((px[0] >= 0) & (px[0] <= cfg.img_W - 1) &
              (px[1] >= 0) & (px[1] <= cfg.img_H - 1) & (cam[2] > 0.1))
    assert inside.sum() > 0

    ld_t = KittiLoader(kitti_root, "val", cfg, seed=1)
    ld_t.mode = "train"
    _check_sample(ld_t[0], cfg)


# --------------------------------------------------------------------------
# nuscenes (fake backend)
# --------------------------------------------------------------------------

class FakeNuScenes:
    def __init__(self, rng, n_frames=9):
        self.rng = rng
        self.chain = [f"ld{i}" for i in range(n_frames)]

    def lidar_points(self, token):
        r = np.random.default_rng(hash(token) % 2**31)
        pc = r.normal(scale=15, size=(600, 3)).astype(np.float32)
        inten = r.uniform(0, 1, (600, 1)).astype(np.float32)
        return pc, inten

    def ego_pose(self, token):
        i = int(token[2:]) if token.startswith("ld") else 0
        P = np.eye(4, dtype=np.float32)
        P[0, 3] = 0.5 * i
        return P

    def calibration(self, token):
        return np.eye(4, dtype=np.float32)

    def camera_K(self, token):
        return np.array([[400.0, 0, 200], [0, 400, 120], [0, 0, 1]],
                        np.float32)

    def camera_image(self, token):
        return self.rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)

    def neighbor(self, token, direction):
        i = int(token[2:])
        j = i + (1 if direction == "next" else -1)
        return f"ld{j}" if 0 <= j < len(self.chain) else ""


def test_nuscenes_loader_with_fake_backend(rng):
    cfg = CFG.replace(accumulation_frame_num=2, accumulation_frame_skip=2,
                      crop_original_top_rows=20)
    backend = FakeNuScenes(rng)
    dataset = [("ld4", {name: ["cam0", "cam1"]
                        for name in ["CAM_FRONT", "CAM_FRONT_LEFT",
                                     "CAM_FRONT_RIGHT", "CAM_BACK",
                                     "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]})]
    ld = NuScenesLoader("/nonexistent", "train", cfg, backend=backend,
                        dataset=dataset, seed=0)
    _check_sample(ld[0], cfg)


class FakeNuscDevkit:
    """nuscenes-devkit shaped fake: .scene list + .get(table, token).

    Ego drives along +x at 1 m per lidar frame; cameras are sampled at the
    same positions.  Exercises the FULL pairing path of
    ``build_dataset_info`` (``make_datasets.py:79-155``).
    """

    def __init__(self, scenes, n_frames=12):
        from deepi2p_tpu.data.nuscenes import CAMERA_NAMES
        self.scene = []
        self._tables = {"sample": {}, "sample_data": {}, "ego_pose": {}}
        for si, (token, desc) in enumerate(scenes):
            first_sample = f"s{si}"
            self.scene.append({"token": token, "description": desc,
                               "first_sample_token": first_sample})
            data = {}
            for name in ["LIDAR_TOP"] + list(CAMERA_NAMES):
                chain = [f"{name}-{si}-{i}" for i in range(n_frames)]
                for i, tok in enumerate(chain):
                    self._tables["sample_data"][tok] = {
                        "token": tok,
                        "ego_pose_token": f"ep-{si}-{i}",
                        "next": chain[i + 1] if i + 1 < n_frames else "",
                    }
                    self._tables["ego_pose"][f"ep-{si}-{i}"] = {
                        "translation": [float(i), 0.0, 0.0]}
                data[name] = chain[0]
            self._tables["sample"][first_sample] = {"data": data}

    def get(self, table, token):
        return self._tables[table][token]


def test_nuscenes_build_dataset_info_pairing(tmp_path):
    import pickle
    from deepi2p_tpu.data.prep.nuscenes_prep import (
        build_dataset_info, TEST_NIGHT_SCENE_TOKENS, is_day_scene)

    night_tok = next(iter(TEST_NIGHT_SCENE_TOKENS))
    nusc = FakeNuscDevkit([
        ("day-scene", "Sunny drive"),
        (night_tok, "Looks sunny but is on the hardcoded night list"),
        ("kw-night", "Night drive in the rain"),
    ])
    assert is_day_scene(nusc.scene[0])
    assert not is_day_scene(nusc.scene[1])      # explicit token exclusion
    assert not is_day_scene(nusc.scene[2])      # description keyword

    out = str(tmp_path / "dataset_info.list")
    ds = build_dataset_info(nusc, max_translation=2.5, frame_skip=2,
                            out_path=out)
    # only the day scene, every 2nd of 12 lidar frames
    assert len(ds) == 6
    assert all(tok.startswith("LIDAR_TOP-0-") for tok, _ in ds)
    lidar_tok, nearby = ds[1]                   # lidar frame i=2, x=2.0
    assert lidar_tok == "LIDAR_TOP-0-2"
    # nearby cameras: |x_cam - 2.0| < 2.5 -> frames 0..4
    assert nearby["CAM_FRONT"] == [f"CAM_FRONT-0-{i}" for i in range(5)]
    with open(out, "rb") as f:
        assert pickle.load(f) == ds


def test_detect_night_scene():
    from deepi2p_tpu.data.prep.nuscenes_prep import detect_night_scene
    dark = np.full((100, 100), 40, np.uint8)
    assert detect_night_scene(dark)
    day = np.full((100, 100), 160, np.uint8)
    assert not detect_night_scene(day)
    # dark image with large bright area (reference: white_area >= 10%)
    lit = np.full((100, 100), 40, np.uint8)
    lit[:20] = 250
    assert not detect_night_scene(lit)


def test_remove_ego_points():
    pc = np.array([[0.0, 0.0, 0.0], [0.5, 1.0, 2.0], [5.0, 0.0, 0.0]],
                  np.float32)
    inten = np.zeros((3, 1), np.float32)
    out, _ = remove_ego_points(pc, inten)
    assert out.shape[0] == 1 and out[0, 0] == 5.0


def test_enu2cam_roundtrip(rng):
    pc = rng.normal(size=(10, 3)).astype(np.float32)
    P = np.eye(4, dtype=np.float32)
    pc2, P2 = enu2cam(pc, P)
    # y_cam = -z_enu, z_cam = y_enu
    np.testing.assert_allclose(pc2[:, 1], -pc[:, 2], atol=1e-6)
    np.testing.assert_allclose(pc2[:, 2], pc[:, 1], atol=1e-6)
    # P2 undoes the conversion: P2 @ convert == P
    for i in range(10):
        h = np.concatenate([pc2[i], [1.0]])
        np.testing.assert_allclose((P2 @ h)[:3],
                                   (P @ np.concatenate([pc[i], [1.0]]))[:3],
                                   atol=1e-5)


# --------------------------------------------------------------------------
# batching / prefetch
# --------------------------------------------------------------------------

def test_batch_loader_and_prefetch():
    cfg = CFG
    ds = SyntheticDataset(cfg, length=10, seed=0)
    bl = BatchLoader(ds, batch_size=4, num_workers=2, seed=0)
    assert len(bl) == 2
    batches = list(device_prefetch(iter(bl), size=2))
    assert len(batches) == 2
    for b in batches:
        assert b["pc"].shape == (4, cfg.input_pt_num, 3)


# --------------------------------------------------------------------------
# native C++ core
# --------------------------------------------------------------------------

def test_native_core_matches_numpy(rng):
    from deepi2p_tpu.data import native
    if not native.available():
        pytest.skip("native library not built")
    pts = rng.normal(size=(500, 3)).astype(np.float32)

    idx = native.fps(pts, 16, seed=3)
    assert len(set(idx.tolist())) == 16
    # FPS property: selected points are mutually far apart vs random picks
    sel = pts[idx]
    d = np.sqrt(np.sum((sel[:, None] - sel[None]) ** 2, -1))
    min_sep = np.min(d + np.eye(16) * 1e9)
    rand_sel = pts[rng.choice(500, 16, replace=False)]
    dr = np.sqrt(np.sum((rand_sel[:, None] - rand_sel[None]) ** 2, -1))
    assert min_sep > np.min(dr + np.eye(16) * 1e9) * 0.8

    from deepi2p_tpu.ops.sampling import voxel_downsample_np
    out_native = native.voxel_downsample(pts, 0.5)
    out_np = voxel_downsample_np(pts, 0.5)
    assert abs(out_native.shape[0] - out_np.shape[0]) <= out_np.shape[0] // 10
    # same centroid overall
    np.testing.assert_allclose(out_native.mean(0), out_np.mean(0), atol=0.15)

    q = rng.normal(size=(20, 3)).astype(np.float32)
    got = native.knn(q, pts, 4)
    d = np.sum((q[:, None] - pts[None]) ** 2, -1)
    want = np.argsort(d, axis=1)[:, :4]
    np.testing.assert_array_equal(got, want)


def test_batch_loader_skip_errors():
    cfg = CFG

    class Flaky:
        def __init__(self):
            self.inner = SyntheticDataset(cfg, length=8, seed=0)

        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise IOError("corrupt sample")
            return self.inner[i]

    bl = BatchLoader(Flaky(), batch_size=4, num_workers=1, shuffle=False,
                     skip_errors=True)
    batches = list(bl)
    assert len(batches) == 2 and bl.error_count == 1


def test_kitti_prep_pipeline(tmp_path, rng):
    """bin -> npy with normals; poses txt -> npz; offline accumulation."""
    from deepi2p_tpu.data.prep.kitti_prep import (
        prepare_frame, kitti_poses_to_npz, accumulate_frames_offline,
        estimate_normals, prepare_frame_in_img_frame)

    raw = rng.normal(scale=10, size=(800, 4)).astype(np.float32)
    bin_path = tmp_path / "000000.bin"
    raw.tofile(bin_path)
    out_path = tmp_path / "000000.npy"
    n = prepare_frame(str(bin_path), str(out_path), voxel=0.5)
    d = np.load(out_path)
    assert d.shape[0] == 7 and d.shape[1] == n
    norms = np.linalg.norm(d[4:7], axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert np.all(d[6] >= -1e-6)  # oriented to +z

    poses = np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(1, 12)
    poses = np.tile(poses, (4, 1))
    poses[:, 3] = np.arange(4)  # tx varies
    txt = tmp_path / "00.txt"
    np.savetxt(txt, poses)
    n = kitti_poses_to_npz(str(txt), str(tmp_path / "poses"))
    assert n == 4
    P1 = np.load(tmp_path / "poses" / "000001.npz")["pose"]
    assert P1[0, 3] == 1.0

    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    for i in range(4):
        np.save(pc_dir / f"{i:06d}.npy",
                rng.normal(scale=5, size=(7, 300)).astype(np.float32))
    written = accumulate_frames_offline(str(pc_dir), str(tmp_path / "poses"),
                                        str(tmp_path / "acc"),
                                        frame_num=1, skip=1, voxel=0.5)
    assert written == 4
    acc = np.load(tmp_path / "acc" / "000001.npy")
    assert acc.shape[0] == 7

    K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]], np.float32)
    Pc = np.eye(4, dtype=np.float32)
    m = prepare_frame_in_img_frame(str(bin_path),
                                   str(tmp_path / "imgframe.npy"),
                                   Pc, K, (80, 100), voxel=0.5)
    assert m > 0


def test_street_scene_structure_and_oracle_solvability():
    """The structured synthetic scene (surfaces, true normals) produces
    sane labels AND a GT-label frustum solve recovers the pose — i.e.
    translation is identifiable, unlike the uniform box cloud (see
    BENCH_NOTES round-2i e2e analysis)."""
    import jax
    import jax.numpy as jnp
    from deepi2p_tpu import config
    from deepi2p_tpu.data import synthetic_batch
    from deepi2p_tpu.ops.projection import project_points, coarse_labels
    from deepi2p_tpu.register import solve_frustum_batch, pose_diff_np

    cfg = config.tiny(synthetic_scene="street", input_pt_num=4096,
                      batch_size=2)
    b = synthetic_batch(cfg, seed=3)
    pc = b["pc"]
    assert np.isfinite(pc).all()
    # normals are unit and axis-aligned-ish (surfaces)
    assert np.allclose(np.linalg.norm(b["sn"], axis=-1), 1.0, atol=1e-5)
    pxpy, z = project_points(jnp.asarray(pc), jnp.asarray(b["P"]),
                             jnp.asarray(b["K"]))
    lab = np.asarray(coarse_labels(pxpy, z, cfg.img_H, cfg.img_W))
    frac = lab.mean(axis=1)
    assert (frac > 0.01).all() and (frac < 0.9).all(), frac

    P_pred, _ = solve_frustum_batch(
        jnp.asarray(pc), jnp.asarray(lab.astype(np.float32)),
        jnp.asarray(b["K"]), H=cfg.img_H, W=cfg.img_W,
        rng=jax.random.PRNGKey(0), n_inits=16, max_iter=48)
    ok = 0
    for i in range(pc.shape[0]):
        P_gt = np.eye(4); P_gt[:3] = b["P"][i]
        rte, rre = pose_diff_np(np.asarray(P_pred[i], np.float64), P_gt)
        ok += (rte < 2.0 and rre < 5.0)
    assert ok >= 1, "street-scene oracle solve failed on both pairs"


def test_synthetic_fresh_scenes_and_zbuffer():
    """fresh=True makes (epoch, index) map to distinct scenes (the infinite
    -data regime); the renderer is deterministic and z-buffered (nearest
    point wins pixel collisions)."""
    cfg = config.tiny(synthetic_scene="street", input_pt_num=512)
    from deepi2p_tpu.data import synthetic_batch

    ds = SyntheticDataset(cfg, length=4, seed=0, fresh=True)
    a0 = ds[0]["pc"]
    ds.set_epoch(1)
    a1 = ds[0]["pc"]
    assert not np.allclose(a0, a1)
    ds_fixed = SyntheticDataset(cfg, length=4, seed=0, fresh=False)
    b0 = ds_fixed[0]["pc"]
    ds_fixed.set_epoch(5)
    assert np.allclose(b0, ds_fixed[0]["pc"])

    # render determinism (z-buffer sort is stable)
    x = synthetic_batch(cfg, batch_size=2, seed=11)
    y = synthetic_batch(cfg, batch_size=2, seed=11)
    assert np.array_equal(x["img"], y["img"])

    # z-buffer: every splatted pixel holds the NEAREST projecting point
    b = synthetic_batch(cfg, batch_size=1, seed=5)
    pc, P, K, img = b["pc"][0], b["P"][0], b["K"][0], b["img"][0]
    cam = pc @ P[:3, :3].T + P[:3, 3]
    z = cam[:, 2]
    front = z > 0.1
    u = (K[0, 0] * cam[:, 0] / np.where(front, z, 1.0) + K[0, 2]).astype(int)
    v = (K[1, 1] * cam[:, 1] / np.where(front, z, 1.0) + K[1, 2]).astype(int)
    m = front & (u >= 0) & (u < cfg.img_W) & (v >= 0) & (v < cfg.img_H)
    best = {}
    for ui, vi, zi in zip(u[m], v[m], z[m]):
        key = (vi, ui)
        best[key] = min(best.get(key, np.inf), zi)
    checked = 0
    for (vi, ui), zmin in best.items():
        expect = np.clip(255.0 * 5.0 / max(zmin, 1.0), 0, 255)
        np.testing.assert_allclose(img[vi, ui, 0], expect, rtol=1e-5)
        checked += 1
    assert checked > 10


def test_synthetic_nuscenes_enu_frame():
    """nuScenes-preset synthetic batches are generated in ENU (z up,
    rotation about z) and enu2cam recovers a camera-convention problem
    with identical labels — the eval path's conversion
    (registration_lsq.py:237-248)."""
    import jax.numpy as jnp
    from deepi2p_tpu.data import synthetic_batch, enu2cam
    from deepi2p_tpu.ops.projection import project_points, coarse_labels

    cfg = config.nuscenes(input_pt_num=1024, node_a_num=16, node_b_num=16,
                          batch_size=2, synthetic_scene="street",
                          img_H=64, img_W=96)
    b = synthetic_batch(cfg, seed=5)
    # rotation block of the ENU pose: rotation about ENU-z composed with
    # the fixed convention change => bottom row of R maps (0,0,1) to
    # camera -y: R @ ez == (0,-1,0)^T-ish? Instead check label parity:
    for i in range(2):
        P4 = np.eye(4, dtype=np.float64)
        P4[:3] = b["P"][i]
        pc_cam, P_cam = enu2cam(b["pc"][i].astype(np.float64), P4)
        # identical projections in both parameterisations
        pxpy_e, z_e = project_points(jnp.asarray(b["pc"][i][None]),
                                     jnp.asarray(b["P"][i][None]),
                                     jnp.asarray(b["K"][i][None]))
        pxpy_c, z_c = project_points(
            jnp.asarray(pc_cam[None].astype(np.float32)),
            jnp.asarray(P_cam[None, :3].astype(np.float32)),
            jnp.asarray(b["K"][i][None]))
        np.testing.assert_allclose(np.asarray(pxpy_e), np.asarray(pxpy_c),
                                   atol=1e-2)
        lab_e = np.asarray(coarse_labels(pxpy_e, z_e, cfg.img_H, cfg.img_W))
        lab_c = np.asarray(coarse_labels(pxpy_c, z_c, cfg.img_H, cfg.img_W))
        np.testing.assert_array_equal(lab_e, lab_c)
        assert 0.005 < lab_e.mean() < 0.9
        # cam-convention cloud is y-down street geometry: ground plane at
        # cam y=+2 (the ENU cloud has it at z=-2)
        assert np.median(pc_cam[:, 1][np.abs(pc_cam[:, 1] - 2) < 0.3]) > 1.5
        # the camera pose is a pure yaw about camera-y (2D solver regime)
        R = P_cam[:3, :3]
        np.testing.assert_allclose(R[1], [0, 1, 0], atol=1e-5)
