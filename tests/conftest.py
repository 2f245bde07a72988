"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on an emulated mesh, SURVEY §4 consequence (4)), float64 enabled for
tight golden comparisons against the NumPy oracle.
"""
import os
import sys
from pathlib import Path

# Force the CPU backend: the image's sitecustomize registers a remote TPU
# platform ("axon") and pins JAX_PLATFORMS to it; config.update overrides it
# post-registration. Tests need CPU for float64 + fast local compiles.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
if str(REPO_ROOT / "tests") not in sys.path:
    sys.path.insert(0, str(REPO_ROOT / "tests"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_assets():
    p = Path("/root/reference/Serial")
    if not p.exists():
        pytest.skip("reference assets not mounted")
    return p


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled-executable state between test modules.

    The suite compiles hundreds of distinct XLA CPU programs in one process;
    past a volume threshold the NEXT backend compile can segfault inside
    jaxlib (observed at test_golden after the round-4 branching-compaction
    programs joined the suite; each test passes standalone). Dropping the
    in-process executable caches per module keeps the resident compiled-code
    volume bounded at the cost of re-tracing shared helpers."""
    yield
    jax.clear_caches()
