"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on the
XLA CPU backend with forced host device count (the driver separately
dry-runs the multi-chip path via ``__graft_entry__.dryrun_multichip``).

Note: the container's ``sitecustomize`` imports jax and registers a remote
single-chip TPU backend at interpreter startup, so env vars set here are too
late — we must override through ``jax.config`` instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ.get("DEEPI2P_TEST_PLATFORM", "cpu"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# --- duration recording (VERDICT r4 #4: tier the suite from MEASURED data) ---
# Every run appends per-test call durations to tests/.last_durations.json
# (overwritten each session).  The `slow` marks in the files are assigned
# from this data; re-run the full suite and diff to re-validate the tiers.
_durations = {}


def pytest_runtest_logreport(report):
    if report.when == "call":
        _durations[report.nodeid] = round(report.duration, 2)


def pytest_sessionfinish(session, exitstatus):
    if not _durations:
        return
    import json
    path = os.path.join(os.path.dirname(__file__), ".last_durations.json")
    # merge with prior runs: a focused re-run must not clobber the full
    # suite's measurements (entries go stale only on test renames)
    try:
        with open(path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged.update(_durations)
    try:
        with open(path, "w") as f:
            json.dump(dict(sorted(merged.items(),
                                  key=lambda kv: -kv[1])), f, indent=1)
    except OSError:
        pass
