"""Test environment: force the CPU backend with 8 virtual devices so
mesh/sharding tests run without TPU hardware (SURVEY.md §4 implication).

The axon sitecustomize registers the TPU backend unconditionally, so the
env var alone is not enough — we also flip jax's config if jax is already
importable.  One TPU chip cannot be shared by parallel test processes;
tests must never touch it.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

import zlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_numpy(request):
    """Deterministic per-test RNG: synthetic fixtures draw random vocab
    sizes/maxlens, so unseeded state makes failures depend on suite
    order.  Seed from the test id instead."""
    np.random.seed(zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF)
