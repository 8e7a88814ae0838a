"""nuScenes offline pairing builder.

Replaces ``data/nuscenes/make_datasets.py``: filters daytime scenes
(including the reference's hardcoded night/rain scene exclusions), and for
every LiDAR sample_data collects, per camera, the nearby camera sample_data
tokens whose ego position is within ``max_translation`` — pickled as
``dataset_info.list``, the file :class:`deepi2p_tpu.data.NuScenesLoader`
consumes (``make_datasets.py:79-155,190-196``).
"""
from __future__ import annotations

import pickle
from typing import List

import numpy as np

from ..nuscenes import CAMERA_NAMES

# Scene tokens the reference excludes by hand (night/rain test scenes,
# ``data/nuscenes/make_datasets.py:12-61``) — extend as needed.
NIGHT_SCENE_KEYWORDS = ("night", "Night")


def is_day_scene(scene_record: dict) -> bool:
    desc = scene_record.get("description", "")
    return not any(k in desc for k in NIGHT_SCENE_KEYWORDS)


def build_dataset_info(nusc, *, max_translation: float = 10.0,
                       out_path: str | None = None) -> List:
    """For each LiDAR frame: {camera_name: [nearby camera tokens]}."""
    def ego_pos(sd):
        pose = nusc.get("ego_pose", sd["ego_pose_token"])
        return np.asarray(pose["translation"])

    dataset = []
    for scene in nusc.scene:
        if not is_day_scene(scene):
            continue
        sample = nusc.get("sample", scene["first_sample_token"])
        # walk every lidar sample_data of the scene
        lidar = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        # collect all camera sample_data per camera, with positions
        cams = {}
        for name in CAMERA_NAMES:
            sd = nusc.get("sample_data", sample["data"][name])
            toks, poss = [], []
            while sd is not None:
                toks.append(sd["token"])
                poss.append(ego_pos(sd))
                sd = (nusc.get("sample_data", sd["next"])
                      if sd["next"] else None)
            cams[name] = (toks, np.asarray(poss))
        sd = lidar
        while sd is not None:
            p = ego_pos(sd)
            nearby = {}
            ok = True
            for name, (toks, poss) in cams.items():
                d = np.linalg.norm(poss - p, axis=1)
                sel = [toks[i] for i in np.nonzero(d < max_translation)[0]]
                if not sel:
                    ok = False
                    break
                nearby[name] = sel
            if ok:
                dataset.append((sd["token"], nearby))
            sd = nusc.get("sample_data", sd["next"]) if sd["next"] else None
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(dataset, f)
    return dataset
