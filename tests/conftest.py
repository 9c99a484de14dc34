"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

# Must be set before jax is imported anywhere. The harness pre-sets
# JAX_PLATFORMS=axon (the real TPU tunnel), so override unconditionally:
# the test suite runs on a virtual 8-device CPU mesh. Set
# FRAG_TEST_TPU=1 to run tests against the real chip instead.
if not os.environ.get("FRAG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not os.environ.get("FRAG_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_fixture_json():
    """Marker-extracted fixture document bundled with the reference (data, not code)."""
    import json
    path = os.path.join(REFERENCE_DIR, "New folder", "cn22-23", "cn22-23.json")
    if not os.path.exists(path):
        pytest.skip("reference fixture not available")
    with open(path) as f:
        return json.load(f)
