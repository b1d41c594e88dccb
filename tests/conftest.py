"""Test configuration: virtual 8-device CPU mesh by default, real TPU
on request.

Default: force a CPU platform with 8 virtual devices
(``xla_force_host_platform_device_count``) so multi-chip sharding is
exercised without hardware.  Set ``MASH_TPU_TEST_TPU=1`` to run the
suite against the real chip instead (single device, Pallas kernels
compiled by Mosaic rather than interpret mode) — the TPU CI mode; see
``.claude/skills/verify/SKILL.md``.  Must run before jax initializes
its backends.
"""

import os

TPU_MODE = os.environ.get("MASH_TPU_TEST_TPU", "") == "1"

if not TPU_MODE:
    # Force CPU regardless of the ambient platform (a sitecustomize
    # hook may pin JAX_PLATFORMS to a TPU plugin; tests must not depend
    # on hardware).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_MODE:
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


def run_cli(argv):
    """Drive the CLI in-process, asserting success; returns stdout.

    Shared by the command-surface tests (one definition instead of a
    copy per file)."""
    import contextlib
    import io

    from mash_tpu.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    assert rc in (0, None), argv
    return buf.getvalue()
