"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so that sharding and
kernel semantics are exercised without TPU hardware; the integer kernels
used by the decode pipeline are bit-exact across XLA backends. Set
CLAXON_TPU_TEST_REAL_DEVICE=1 to run on whatever JAX finds instead.
"""

import os
import sys
import pathlib

if not os.environ.get("CLAXON_TPU_TEST_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_SAMPLES = pathlib.Path("/root/reference/testsamples")

import pytest


@pytest.fixture(scope="session")
def testsamples():
    """Path to the committed reference test corpus (data files only)."""
    if not REFERENCE_SAMPLES.is_dir():
        pytest.skip("reference testsamples not available")
    return REFERENCE_SAMPLES
