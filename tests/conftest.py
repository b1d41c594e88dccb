"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) since tests may run without TPU
hardware.  Must run before jax initializes its backends.
"""

import os

# Force CPU regardless of the ambient platform (a sitecustomize hook may
# pin JAX_PLATFORMS to a TPU plugin; tests must not depend on hardware).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_TEST_DIR = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def reference_test_dir():
    """Directory with the reference's bundled test data, if present."""
    if not REFERENCE_TEST_DIR.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_TEST_DIR
