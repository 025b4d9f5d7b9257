"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding
(jax.sharding.Mesh) is exercised without TPU hardware. Environment must be
set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Needed by the reference shim (tools.refshim) for pure-Python numba paths.
os.environ.setdefault("NUMBA_DISABLE_JIT", "1")
# Persistent compilation cache: repeated test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS in
# the environment; the config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _reference_available() -> bool:
    try:
        from tools.refshim import pp  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not _reference_available(),
    reason="reference PorePy checkout not importable on this machine",
)


@pytest.fixture(scope="session")
def ref_pp():
    """The reference porepy package, imported through the dependency shim."""
    from tools.refshim import pp

    return pp


def assert_sparse_equal(a, b, atol=1e-12, rtol=1e-10):
    """Assert two scipy sparse matrices are numerically identical."""
    import scipy.sparse as sps

    a = sps.csr_matrix(a)
    b = sps.csr_matrix(b)
    assert a.shape == b.shape
    d = abs(a - b)
    if d.nnz:
        scale = max(abs(a).max(), abs(b).max(), 1.0)
        assert d.max() <= atol + rtol * scale, f"max diff {d.max()}"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# -- fast/slow test tiers -------------------------------------------------------
#
# ``pytest -m "not slow"`` is the smoke tier: it must give a green/red
# signal in a few minutes cold-cache. Everything end-to-end (functional
# convergence studies, tutorial replays, full model time loops) is marked
# slow by location so a CI driver never needs a per-test opt-in list.

_SLOW_PATH_PARTS = (
    "tests/functional",
    "tests/examples",
    "tests/test_tutorials.py",
    "tests/models",
    "tests/compositional",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        path = str(getattr(item, "fspath", ""))
        if any(part in path for part in _SLOW_PATH_PARTS):
            item.add_marker(pytest.mark.slow)
