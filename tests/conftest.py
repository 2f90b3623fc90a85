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


@pytest.fixture(autouse=True)
def _isolate_global_config():
    """Snapshot + restore deepctr_tpu.config's module globals and the
    engine env knobs around every test.  Tests that flip
    set_use_pallas / set_gather_mode / set_embedding_exchange /
    set_compute_dtype all restore in try/finally, but one escaped
    toggle poisons every later test in the worker in order-dependent
    ways (a set_use_pallas(True) leak makes unrelated CPU tests trace
    Pallas kernels: 'Only interpret mode is supported on CPU backend').
    Belt-and-braces: restore unconditionally."""
    from deepctr_tpu import config as dc_config
    saved = {k: getattr(dc_config, k) for k in dir(dc_config)
             if k.startswith("_") and not k.startswith("__")
             and k == k.upper()}
    env_keys = ("DEEPCTR_UPDATE_MODE", "DEEPCTR_FORCE_COMBINED",
                "DEEPCTR_GATHER_MODE", "DEEPCTR_SCATTER_UNROLL",
                "DEEPCTR_DEDUP_IMPL", "DEEPCTR_SPARSE_MIN_ROWS",
                "DEEPCTR_SUBST_BARRIER", "DEEPCTR_UPDATE_WINDOW",
                "DEEPCTR_GRU_KERNEL", "DEEPCTR_ADAM_T")
    saved_env = {k: os.environ.get(k) for k in env_keys}
    yield
    for k, v in saved.items():
        setattr(dc_config, k, v)
    for k, v in saved_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
