"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so that sharding and
kernel semantics are exercised without TPU hardware; the integer kernels
used by the decode pipeline are bit-exact across XLA backends.

IMPORTANT (environment quirk): this container's sitecustomize imports jax
at interpreter start and pins the 'axon' remote-TPU platform; JAX_PLATFORMS
in the environment is ignored. The working override is
``jax.config.update("jax_platforms", "cpu")`` after import. Op-by-op
dispatch on the axon backend does a remote compile per op (~seconds each),
so tests must never run there. Set CLAXON_TPU_TEST_REAL_DEVICE=1 to run on
the real device anyway.
"""

import os
import sys
import pathlib

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

if os.environ.get("CLAXON_TPU_TEST_REAL_DEVICE", "0").lower() in ("", "0", "false", "no"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        # Read when the CPU PJRT client initializes (first use), so setting
        # it here is early enough even though jax is already imported.
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compile cache: a cold suite run pays ~9 min of CPU
    # compiles on this one-core host; warm re-runs skip them entirely.
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".test_cache" / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_SAMPLES = pathlib.Path("/root/reference/testsamples")


def _ensure_map_count_headroom():
    """XLA:CPU's JIT never unmaps compiled-program mappings, so a cold
    suite run (hundreds of distinct programs) can exhaust
    ``vm.max_map_count`` at its 65530 default and segfault inside the
    compile-cache write (observed 2026-08-18, test_sweep at 93%). The
    sysctl resets every boot; raise it when we can, warn loudly when we
    can't."""
    knob = pathlib.Path("/proc/sys/vm/max_map_count")
    try:
        current = int(knob.read_text())
    except OSError:
        return
    if current >= 262144:
        return
    try:
        knob.write_text("1048576\n")
    except OSError:
        sys.stderr.write(
            "WARNING: vm.max_map_count=%d is too low for a cold-cache "
            "test run and cannot be raised (not root?). A long run may "
            "segfault in XLA's JIT; run "
            "`sysctl -w vm.max_map_count=1048576` first.\n" % current)


_ensure_map_count_headroom()

# The library default is segmentation="auto" (calibrate on the first
# engaging batch). Under the suite that would recompile BOTH paths'
# programs inside every pipeline test on this one-core host; pin the
# host walk here and let the segmented/auto tests opt in explicitly
# (test_seg_*, the auto tests monkeypatch the env / pass segmentation=).
os.environ.setdefault("CLAXON_TPU_SEGMENTATION", "host")

import pytest


@pytest.fixture(autouse=True)
def _clear_seg_reject_cache():
    """Keep tests order-independent: the segmented path learns rejecting
    streams per process (pipeline_seg._REJECT_CACHE) and would otherwise
    pre-route a stream another test decoded first."""
    import sys
    ps = sys.modules.get("claxon_tpu.pipeline_seg")
    if ps is not None:
        ps._REJECT_CACHE.clear()
    yield


@pytest.fixture(scope="session")
def testsamples():
    """Path to the committed reference test corpus (data files only)."""
    if not REFERENCE_SAMPLES.is_dir():
        pytest.skip("reference testsamples not available")
    return REFERENCE_SAMPLES
