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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_TESTS = "/root/reference/tests"


@pytest.fixture
def ref_tests_dir():
    return REF_TESTS
