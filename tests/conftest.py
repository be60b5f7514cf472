"""Shared test configuration.

Sharding/multi-device tests run on a virtual 8-device CPU mesh; everything
else is backend-agnostic.  The environment variables must be set before jax
initialises, hence they live here at import time.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REF_TESTS = "/root/reference/tests"


@pytest.fixture
def ref_tests_dir():
    return REF_TESTS
