"""Host data-pipeline throughput benchmark (VERDICT r1 weak #6).

Builds a realistic fake Oxford traversal on local disk (full-size clouds:
~45k raw points per .npy, 1280x960 jpgs), then measures OxfordLoader +
BatchLoader throughput at the training batch size.  The TPU train step is
232 ms at B=8 => the pipeline must sustain >= 34.5 samples/s to keep the
chip fed.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_loader.py \
        [--workers N] [--samples M]
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

from deepi2p_tpu import config
from deepi2p_tpu.data.oxford import OxfordLoader
from deepi2p_tpu.data.prefetch import BatchLoader


def build_fake_traversal(root: str, n_pc: int = 40, n_cam: int = 200,
                         raw_points: int = 45000, seed: int = 0):
    """Training-shaped on-disk layout (no SDK needed — loader format)."""
    import cv2
    rng = np.random.default_rng(seed)
    trav = "2015-01-01-00-00-00"
    tdir = os.path.join(root, trav)
    os.makedirs(os.path.join(tdir, "lms_front"), exist_ok=True)
    os.makedirs(os.path.join(tdir, "stereo", "centre"), exist_ok=True)

    pc_ts = np.arange(n_pc, dtype=np.int64) * 200000 + 10 ** 12
    cam_ts = np.arange(n_cam, dtype=np.int64) * 40000 + 10 ** 12
    # poses: forward motion along camera z (P_convert maps VO x -> cam z)
    def poses(ts, step):
        out = np.tile(np.eye(4), (len(ts), 1, 1))
        out[:, 0, 3] = np.arange(len(ts)) * step     # VO frame x == forward
        return out
    np.save(os.path.join(tdir, "pc_timestamps.npy"), pc_ts)
    np.save(os.path.join(tdir, "pc_poses.npy"), poses(pc_ts, 2.0))
    np.save(os.path.join(tdir, "camera_timestamps.npy"), cam_ts)
    np.save(os.path.join(tdir, "camera_poses.npy"), poses(cam_ts, 0.4))

    img = rng.integers(0, 255, size=(960, 1280, 3)).astype(np.uint8)
    ok = cv2.imwrite(os.path.join(tdir, "stereo", "centre",
                                  f"{cam_ts[0]}.jpg"), img)
    assert ok
    jpg = open(os.path.join(tdir, "stereo", "centre",
                            f"{cam_ts[0]}.jpg"), "rb").read()
    for ts in cam_ts[1:]:
        with open(os.path.join(tdir, "stereo", "centre", f"{ts}.jpg"),
                  "wb") as f:
            f.write(jpg)

    for ts in pc_ts:
        cloud = np.concatenate([
            rng.uniform(-50, 50, (3, raw_points)),
            rng.uniform(0, 255, (1, raw_points))], axis=0).astype(np.float32)
        cloud[1] = rng.uniform(-3, 1, raw_points)
        np.save(os.path.join(tdir, "lms_front", f"{ts}.npy"), cloud)

    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write(trav + "\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write(trav + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=10)
    ap.add_argument("--samples", type=int, default=96)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        build_fake_traversal(root)
        print(f"fake traversal built in {time.perf_counter() - t0:.1f}s")

        cfg = config.oxford(batch_size=args.batch_size, translation_max=80.0,
                            test_translation_max=80.0)
        ds = OxfordLoader(root, "train", cfg, seed=0)

        # steady-state per-core cost: single worker, full pass timed from
        # iterator creation (multi-worker numbers in a 1-core container
        # only measure buffer drains, not production)
        loader = BatchLoader(ds, args.batch_size, num_workers=1, seed=0)
        n_batches = min(args.samples // args.batch_size, len(loader))
        it = iter(loader)
        next(it)                                    # cv2/page-cache warmup
        t0 = time.perf_counter()
        timed = 0
        for _ in range(n_batches - 1):
            next(it)
            timed += 1
        dt = time.perf_counter() - t0
        it.close()

        per_core = timed * args.batch_size / dt
        required = 1000.0 / 232.0 * args.batch_size   # 34.5 samples/s
        cores = os.cpu_count() or 1
        print(json.dumps({
            "metric": "loader_samples_per_sec_per_core",
            "value": round(per_core, 2),
            "unit": "samples/s/core",
            "per_sample_ms": round(1000.0 / per_core, 1),
            "train_step_requires_samples_per_sec": round(required, 1),
            "cores_needed_for_232ms_step": round(required / per_core, 2),
            "container_cores": cores,
            "keeps_tpu_fed_on_this_host": per_core * cores >= required,
        }))


if __name__ == "__main__":
    main()
