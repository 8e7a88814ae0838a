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
