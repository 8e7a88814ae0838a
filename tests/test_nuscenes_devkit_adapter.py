"""Conformance test for the real devkit adapter (``data/nuscenes.py::
devkit_backend``) against an API-faithful fake ``nuscenes``/``pyquaternion``.

The nuscenes-devkit is not installed in CI, so the adapter's import-gated
code never ran before this test.  Here the exact import surface it uses —
``nuscenes.nuscenes.NuScenes`` (``.dataroot``, ``.get(table, token)``),
``nuscenes.utils.data_classes.LidarPointCloud.from_file`` (``.points``
(4, N)) and ``pyquaternion.Quaternion`` (``.rotation_matrix``) — is
faked at module level with the real devkit's record schemas
(sample_data / ego_pose / calibrated_sensor tables, quaternion+translation
poses, ``camera_intrinsic``), and the adapter + full ``NuScenesLoader``
run over it end-to-end.  Pins the API surface so a real-devkit run cannot
drift silently.  Reference: ``data/nuscenes_pc_img_pose_loader.py:100-408``.
"""
import os
import sys
import types

import numpy as np
import pytest

from deepi2p_tpu import config


def _quaternion_cls():
    class Quaternion:
        """w-x-y-z quaternion like pyquaternion (unit input assumed)."""

        def __init__(self, wxyz):
            self.q = np.asarray(wxyz, np.float64)

        @property
        def rotation_matrix(self):
            w, x, y, z = self.q / np.linalg.norm(self.q)
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)],
            ])
    return Quaternion


def _build_fake_devkit(root, rng, n_frames=8):
    """Write lidar bins + camera jpgs and fabricate the devkit tables."""
    import cv2

    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    tables = {"sample_data": {}, "ego_pose": {}, "calibrated_sensor": {}}

    def yaw_quat(a):
        return [np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)]

    tables["calibrated_sensor"]["cs_lidar"] = {
        "rotation": yaw_quat(0.3), "translation": [0.9, 0.0, 1.8],
        "camera_intrinsic": []}
    tables["calibrated_sensor"]["cs_cam"] = {
        "rotation": yaw_quat(-0.2), "translation": [1.5, 0.2, 1.5],
        "camera_intrinsic": [[620.0, 0.0, 320.0], [0.0, 620.0, 176.0],
                             [0.0, 0.0, 1.0]]}

    lidar_tokens = []
    for i in range(n_frames):
        tok = f"lidar_{i:03d}"
        # nuScenes lidar bins are float32 (x, y, z, intensity, ring) x N
        pts = rng.normal(size=(64, 5)).astype(np.float32) * 5.0
        pts[:, 3:] = np.abs(pts[:, 3:])
        fn = f"samples/{tok}.bin"
        pts.tofile(os.path.join(root, fn))
        tables["ego_pose"][f"ep_{tok}"] = {
            "rotation": yaw_quat(0.02 * i), "translation": [2.0 * i, 0.1, 0]}
        tables["sample_data"][tok] = {
            "filename": fn, "ego_pose_token": f"ep_{tok}",
            "calibrated_sensor_token": "cs_lidar",
            "prev": f"lidar_{i-1:03d}" if i > 0 else "",
            "next": f"lidar_{i+1:03d}" if i < n_frames - 1 else ""}
        lidar_tokens.append(tok)

    cam_tok = "cam_000"
    # real nuScenes camera frames are 900x1600 (crop 100 top rows, x0.2
    # scale -> the 160x320 training window)
    img = (rng.uniform(size=(900, 1600, 3)) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "samples/cam_000.jpg"), img)
    tables["ego_pose"]["ep_cam"] = {
        "rotation": yaw_quat(0.05), "translation": [1.0, 0.0, 0.0]}
    tables["sample_data"][cam_tok] = {
        "filename": "samples/cam_000.jpg", "ego_pose_token": "ep_cam",
        "calibrated_sensor_token": "cs_cam", "prev": "", "next": ""}
    return tables, lidar_tokens, cam_tok


@pytest.fixture
def fake_devkit_modules(tmp_path, rng, monkeypatch):
    """Install fake nuscenes/pyquaternion into sys.modules; yield tables."""
    root = str(tmp_path)
    tables, lidar_tokens, cam_tok = _build_fake_devkit(root, rng)

    class NuScenes:
        def __init__(self, version, dataroot, verbose=False):
            assert version in ("v1.0-trainval", "v1.0-test"), version
            self.version, self.dataroot = version, dataroot

        def get(self, table, token):
            return tables[table][token]

    class LidarPointCloud:
        def __init__(self, points):
            self.points = points

        @classmethod
        def from_file(cls, path):
            raw = np.fromfile(path, np.float32).reshape(-1, 5)
            return cls(raw.T[:4])           # devkit keeps (4, N): xyz + int

    nusc_mod = types.ModuleType("nuscenes")
    nusc_nusc = types.ModuleType("nuscenes.nuscenes")
    nusc_nusc.NuScenes = NuScenes
    nusc_utils = types.ModuleType("nuscenes.utils")
    nusc_dc = types.ModuleType("nuscenes.utils.data_classes")
    nusc_dc.LidarPointCloud = LidarPointCloud
    nusc_mod.nuscenes = nusc_nusc
    nusc_mod.utils = nusc_utils
    nusc_utils.data_classes = nusc_dc
    pyq = types.ModuleType("pyquaternion")
    pyq.Quaternion = _quaternion_cls()
    for name, mod in [("nuscenes", nusc_mod),
                      ("nuscenes.nuscenes", nusc_nusc),
                      ("nuscenes.utils", nusc_utils),
                      ("nuscenes.utils.data_classes", nusc_dc),
                      ("pyquaternion", pyq)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return root, tables, lidar_tokens, cam_tok


def test_devkit_backend_conformance(fake_devkit_modules):
    from deepi2p_tpu.data.nuscenes import devkit_backend
    root, tables, lidar_tokens, cam_tok = fake_devkit_modules
    bk = devkit_backend(root, "v1.0-trainval")

    pc, intensity = bk.lidar_points(lidar_tokens[0])
    assert pc.shape == (64, 3) and intensity.shape == (64, 1)
    assert pc.dtype == np.float32

    P = bk.ego_pose(lidar_tokens[2])
    np.testing.assert_allclose(P[:3, 3], [4.0, 0.1, 0.0], atol=1e-6)
    np.testing.assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3), atol=1e-6)

    C = bk.calibration(lidar_tokens[0])
    np.testing.assert_allclose(C[:3, 3], [0.9, 0.0, 1.8], atol=1e-6)

    K = bk.camera_K(cam_tok)
    assert K.shape == (3, 3) and K[0, 0] == 620.0

    img = bk.camera_image(cam_tok)
    assert img.shape == (900, 1600, 3) and img.dtype == np.uint8

    assert bk.neighbor(lidar_tokens[1], "next") == lidar_tokens[2]
    assert bk.neighbor(lidar_tokens[1], "prev") == lidar_tokens[0]
    assert bk.neighbor(lidar_tokens[0], "prev") == ""


def test_nuscenes_loader_over_devkit_backend(fake_devkit_modules):
    """Full loader __getitem__ through the REAL adapter (accumulation,
    pairing, image processing, label-ready sample assembly)."""
    from deepi2p_tpu.data.nuscenes import NuScenesLoader, devkit_backend
    root, tables, lidar_tokens, cam_tok = fake_devkit_modules
    cfg = config.nuscenes().replace(
        input_pt_num=256, node_a_num=8, node_b_num=8,
        accumulation_frame_num=2, accumulation_frame_skip=2)
    dataset = [(lidar_tokens[3], {name: [cam_tok] for name in
                ("CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
                 "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")})]
    loader = NuScenesLoader(root, "train", cfg,
                            backend=devkit_backend(root, "v1.0-trainval"),
                            dataset=dataset, seed=0)
    s = loader[0]
    assert s["pc"].shape == (cfg.input_pt_num, 3)
    assert s["img"].shape == (cfg.img_H, cfg.img_W, 3)
    assert np.isfinite(s["P"]).all() and s["P"].shape == (3, 4)
    # pose orthonormality survives the ego/calib chain
    R = s["P"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
