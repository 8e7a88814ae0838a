"""End-to-end tests for the in-repo nuScenes table reader
(``data/nuscenes_tables.py``) — the devkit-free path.

A miniature nuScenes v1.0 tree is written to disk with REAL json table
files (scene / sample / sample_data / ego_pose / calibrated_sensor /
sensor, schema-faithful: token-keyed records, prev/next chains,
``is_key_frame``, ``filename`` relative to dataroot, wxyz quaternions,
float32 5-dim ``.pcd.bin``).  Then:

  * ``NuScenesTables`` reproduces the devkit's derived reverse index
    (``sample["data"][channel]``, ``NuScenes.__make_reverse_index__``);
  * ``tables_backend`` passes the same conformance surface as the
    devkit adapter (``tests/test_nuscenes_devkit_adapter.py``);
  * the OFFLINE prep (``build_dataset_info``,
    ``data/nuscenes/make_datasets.py:79-155``) and the ONLINE loader
    (``data/nuscenes_pc_img_pose_loader.py:100-408``) run over it
    back-to-back with no fake modules installed.
"""
import json
import math
import os

import numpy as np
import pytest

from deepi2p_tpu import config
from deepi2p_tpu.data.nuscenes import (CAMERA_NAMES, NuScenesLoader,
                                       default_backend, tables_backend)
from deepi2p_tpu.data.nuscenes_tables import (NuScenesTables,
                                              quaternion_rotation_matrix,
                                              read_lidar_bin)
from deepi2p_tpu.data.prep.nuscenes_prep import build_dataset_info


def _yaw_quat(a):
    return [math.cos(a / 2), 0.0, 0.0, math.sin(a / 2)]


def _write_mini_nuscenes(root, rng, version="v1.0-trainval", n_frames=8):
    """Write a schema-faithful one-scene nuScenes tree; returns tokens."""
    import cv2

    os.makedirs(os.path.join(root, version), exist_ok=True)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)

    sensors = [{"token": "sen_lidar", "channel": "LIDAR_TOP",
                "modality": "lidar"}]
    calibs = [{"token": "cs_lidar", "sensor_token": "sen_lidar",
               "rotation": _yaw_quat(0.3), "translation": [0.9, 0.0, 1.8],
               "camera_intrinsic": []}]
    for name in CAMERA_NAMES:
        sensors.append({"token": f"sen_{name}", "channel": name,
                        "modality": "camera"})
        calibs.append({"token": f"cs_{name}", "sensor_token": f"sen_{name}",
                       "rotation": _yaw_quat(-0.2),
                       "translation": [1.5, 0.2, 1.5],
                       "camera_intrinsic": [[620.0, 0.0, 320.0],
                                            [0.0, 620.0, 176.0],
                                            [0.0, 0.0, 1.0]]})

    ego_poses, sample_datas, lidar_tokens = [], [], []
    img = (rng.uniform(size=(900, 1600, 3)) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "samples/cam.jpg"), img)
    for i in range(n_frames):
        tok = f"lidar_{i:03d}"
        pts = rng.normal(size=(64, 5)).astype(np.float32) * 5.0
        pts[:, 3:] = np.abs(pts[:, 3:])
        fn = f"samples/{tok}.pcd.bin"
        pts.tofile(os.path.join(root, fn))
        ego_poses.append({"token": f"ep_{tok}", "rotation": _yaw_quat(0.02 * i),
                          "translation": [2.0 * i, 0.1, 0.0]})
        sample_datas.append({
            "token": tok, "sample_token": "samp_0", "filename": fn,
            "ego_pose_token": f"ep_{tok}", "calibrated_sensor_token": "cs_lidar",
            "is_key_frame": i == 0,
            "prev": f"lidar_{i-1:03d}" if i > 0 else "",
            "next": f"lidar_{i+1:03d}" if i < n_frames - 1 else ""})
        lidar_tokens.append(tok)
    cam_tokens = {}
    for name in CAMERA_NAMES:
        tok = f"cam_{name}"
        ego_poses.append({"token": f"ep_{tok}", "rotation": _yaw_quat(0.05),
                          "translation": [1.0, 0.0, 0.0]})
        sample_datas.append({
            "token": tok, "sample_token": "samp_0",
            "filename": "samples/cam.jpg", "ego_pose_token": f"ep_{tok}",
            "calibrated_sensor_token": f"cs_{name}", "is_key_frame": True,
            "prev": "", "next": ""})
        cam_tokens[name] = tok

    tables = {
        "sensor": sensors,
        "calibrated_sensor": calibs,
        "ego_pose": ego_poses,
        "sample_data": sample_datas,
        "sample": [{"token": "samp_0", "timestamp": 0, "prev": "",
                    "next": "", "scene_token": "scene_0"}],
        "scene": [{"token": "scene_0", "log_token": "log_0",
                   "nbr_samples": 1, "first_sample_token": "samp_0",
                   "last_sample_token": "samp_0", "name": "scene-0001",
                   "description": "Sunny day, parked cars"}],
    }
    for name, records in tables.items():
        with open(os.path.join(root, version, name + ".json"), "w") as f:
            json.dump(records, f)
    return lidar_tokens, cam_tokens


@pytest.fixture
def mini_nuscenes(tmp_path, rng):
    root = str(tmp_path)
    lidar_tokens, cam_tokens = _write_mini_nuscenes(root, rng)
    return root, lidar_tokens, cam_tokens


def test_quaternion_and_lidar_decode(tmp_path, rng):
    # quaternion: yaw rotation round-trip + normalisation
    a = 0.7
    R = quaternion_rotation_matrix([2 * math.cos(a / 2), 0, 0,
                                    2 * math.sin(a / 2)])  # non-unit input
    expect = np.array([[math.cos(a), -math.sin(a), 0],
                       [math.sin(a), math.cos(a), 0], [0, 0, 1]])
    np.testing.assert_allclose(R, expect, atol=1e-12)

    pts = rng.normal(size=(17, 5)).astype(np.float32)
    path = str(tmp_path / "x.pcd.bin")
    pts.tofile(path)
    pc, intensity = read_lidar_bin(path)
    np.testing.assert_array_equal(pc, pts[:, :3])
    np.testing.assert_array_equal(intensity, pts[:, 3:4])


def test_tables_reverse_index(mini_nuscenes):
    """sample["data"] / sample_data["channel"] are derived, not raw JSON."""
    root, lidar_tokens, cam_tokens = mini_nuscenes
    nusc = NuScenesTables("v1.0-trainval", root)
    samp = nusc.get("sample", "samp_0")
    assert samp["data"]["LIDAR_TOP"] == lidar_tokens[0]
    for name in CAMERA_NAMES:
        assert samp["data"][name] == cam_tokens[name]
    # non-key-frame lidar sweeps don't enter sample["data"] but are tagged
    sd1 = nusc.get("sample_data", lidar_tokens[1])
    assert sd1["channel"] == "LIDAR_TOP" and not sd1["is_key_frame"]
    assert nusc.scene[0]["name"] == "scene-0001"


def test_tables_backend_conformance(mini_nuscenes):
    """Same surface as test_devkit_backend_conformance, devkit-free."""
    root, lidar_tokens, cam_tokens = mini_nuscenes
    bk = tables_backend(root, "v1.0-trainval")

    pc, intensity = bk.lidar_points(lidar_tokens[0])
    assert pc.shape == (64, 3) and intensity.shape == (64, 1)
    assert pc.dtype == np.float32

    P = bk.ego_pose(lidar_tokens[2])
    np.testing.assert_allclose(P[:3, 3], [4.0, 0.1, 0.0], atol=1e-6)
    np.testing.assert_allclose(P[:3, :3] @ P[:3, :3].T, np.eye(3), atol=1e-6)

    C = bk.calibration(lidar_tokens[0])
    np.testing.assert_allclose(C[:3, 3], [0.9, 0.0, 1.8], atol=1e-6)

    K = bk.camera_K(cam_tokens["CAM_FRONT"])
    assert K.shape == (3, 3) and K[0, 0] == 620.0

    img = bk.camera_image(cam_tokens["CAM_FRONT"])
    assert img.shape == (900, 1600, 3) and img.dtype == np.uint8

    assert bk.neighbor(lidar_tokens[1], "next") == lidar_tokens[2]
    assert bk.neighbor(lidar_tokens[1], "prev") == lidar_tokens[0]
    assert bk.neighbor(lidar_tokens[0], "prev") == ""


def test_prep_to_loader_chain_devkit_free(mini_nuscenes):
    """Offline pairing + online loader over real files, no fake modules."""
    root, lidar_tokens, cam_tokens = mini_nuscenes
    nusc = NuScenesTables("v1.0-trainval", root)
    dataset = build_dataset_info(nusc, max_translation=1e9, frame_skip=2)
    # every 2nd lidar sweep kept, each paired with all 6 cameras
    assert [tok for tok, _ in dataset] == lidar_tokens[::2]
    assert set(dataset[0][1]) == set(CAMERA_NAMES)

    cfg = config.nuscenes().replace(
        input_pt_num=256, node_a_num=8, node_b_num=8,
        accumulation_frame_num=2, accumulation_frame_skip=2)
    loader = NuScenesLoader(root, "train", cfg,
                            backend=tables_backend(root, "v1.0-trainval"),
                            dataset=dataset, seed=0)
    s = loader[1]
    assert s["pc"].shape == (cfg.input_pt_num, 3)
    assert s["img"].shape == (cfg.img_H, cfg.img_W, 3)
    R = s["P"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_default_backend_falls_back_to_tables(mini_nuscenes):
    """With no devkit installed, default_backend serves the tables path."""
    root, lidar_tokens, _ = mini_nuscenes
    with pytest.raises(ImportError):
        import nuscenes  # noqa: F401  (genuinely absent in this image)
    bk = default_backend(root, "v1.0-trainval")
    pc, _ = bk.lidar_points(lidar_tokens[0])
    assert pc.shape == (64, 3)
