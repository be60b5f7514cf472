"""Shared test configuration.

Tests run on a virtual 8-device CPU mesh (the TPU is reserved for bench.py).
The axon sitecustomize registers the TPU backend at interpreter start and
forces ``jax_platforms``; overriding the config after import wins, but the
XLA host-device-count flag must be in place before the CPU backend
initialises — hence everything happens here at conftest import time.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

# Scrub the axon-TPU env so every SUBPROCESS a test spawns (CLI runs,
# distributed workers, device probes) inherits a TPU-free world: the axon
# sitecustomize registers its PJRT plugin in every python process when
# PALLAS_AXON_POOL_IPS is set, and a stray backend init from a test child
# can wedge the single chip for minutes (one chip, one process).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_TESTS = "/root/reference/tests"


@pytest.fixture
def ref_tests_dir():
    return REF_TESTS
