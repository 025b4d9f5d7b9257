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
    if os.environ.get("PPT_NO_REFERENCE") == "1":
        return False  # force replay-from-goldens mode (tests the CI path)
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


# -- golden record/replay -------------------------------------------------------
#
# Reference-derived arrays are checked in as compressed ``.npz`` files under
# ``tests/goldens/`` so that parity tests keep running on machines WITHOUT a
# reference checkout (the reference itself ships its goldens as
# ``applications/test_utils/reference_dense_arrays.py``). With the reference
# importable the values are computed live — and compared against the stored
# golden, guarding against silent drift of the recording; the file is
# (re)recorded when missing or when ``PPT_REGEN_GOLDENS=1``.

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden_pack(vals: dict) -> dict:
    """Flatten a {name: ndarray | scipy sparse} dict into npz-storable
    arrays (sparse matrices become four ``name.csr.*`` entries)."""
    import scipy.sparse as sps

    out = {}
    for name, v in vals.items():
        if sps.issparse(v):
            m = v.tocsr()
            out[f"{name}.csr.data"] = m.data
            out[f"{name}.csr.indices"] = m.indices
            out[f"{name}.csr.indptr"] = m.indptr
            out[f"{name}.csr.shape"] = np.asarray(m.shape)
        else:
            out[name] = np.asarray(v)
    return out


def _golden_unpack(z) -> dict:
    import scipy.sparse as sps

    out = {}
    for key in z.files:
        if key.endswith(".csr.data"):
            name = key[: -len(".csr.data")]
            out[name] = sps.csr_matrix(
                (
                    z[f"{name}.csr.data"],
                    z[f"{name}.csr.indices"],
                    z[f"{name}.csr.indptr"],
                ),
                shape=tuple(z[f"{name}.csr.shape"]),
            )
        elif ".csr." not in key:
            out[key] = z[key]
    return out


def _golden_equal(a, b) -> bool:
    import scipy.sparse as sps

    if sps.issparse(a) or sps.issparse(b):
        a, b = sps.csr_matrix(a), sps.csr_matrix(b)
        if a.shape != b.shape:
            return False
        if min(b.shape) == 0 or b.nnz == 0:
            d = abs(a - b)
            return d.nnz == 0 or d.max() == 0.0
        d = abs(a - b)
        scale = max(abs(b).max(), 1.0)
        return (d.max() if d.nnz else 0.0) <= 1e-9 * scale
    a, b = np.asarray(a), np.asarray(b)
    if a.dtype.kind not in "fc" or b.dtype.kind not in "fc":
        # strings, ints, bools: exact equality (allclose rejects or
        # mis-promotes them)
        return np.array_equal(a, b)
    return np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)


@pytest.fixture
def golden(request):
    """Record/replay store for reference-derived values.

    Usage::

        def test_x(golden):
            vals = golden(lambda ref_pp: {"mat": <sparse>, "u": <ndarray>})
            # compare framework results against vals["mat"], vals["u"]

    Live mode (reference importable): computes via the callback, records
    ``tests/goldens/<nodeid>.npz`` when absent (or PPT_REGEN_GOLDENS=1) and
    asserts the stored golden still matches the live values. Replay mode:
    loads the stored file; skips only if it was never recorded.
    """
    key = (
        request.node.nodeid.split("::", 1)[-1]
        .replace("::", ".")
        .replace("/", "_")
        .replace("[", "(")
        .replace("]", ")")
    )
    fname = os.path.join(GOLDEN_DIR, f"{key}.npz")

    def fetch(compute):
        if _reference_available():
            from tools.refshim import pp as _ref

            vals = compute(_ref)
            if os.environ.get("PPT_REGEN_GOLDENS") == "1" or not os.path.exists(
                fname
            ):
                os.makedirs(GOLDEN_DIR, exist_ok=True)
                np.savez_compressed(fname, **_golden_pack(vals))
            else:
                stored = _golden_unpack(np.load(fname))
                for name, v in vals.items():
                    assert name in stored, f"golden {key} missing {name!r}"
                    assert _golden_equal(stored[name], v), (
                        f"golden {key}:{name} is stale — regenerate with "
                        "PPT_REGEN_GOLDENS=1"
                    )
            return vals
        if os.path.exists(fname):
            return _golden_unpack(np.load(fname))
        pytest.skip(
            "reference PorePy not importable and no recorded golden "
            f"({fname})"
        )

    return fetch


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
