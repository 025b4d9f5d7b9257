"""Shim to make the read-only reference porepy importable on this machine.

The reference requires meshio, gmsh and numba, none of which are installed.
This module installs minimal fake modules BEFORE importing porepy so that the
pure-Python code paths run (NUMBA_DISABLE_JIT must be set to '1' in the
environment before Python starts for porepy's compositional module to pick
the non-jit branch).

Usage:
    NUMBA_DISABLE_JIT=1 python -c "from tools.refshim import pp"
"""
import os
import sys
import types

os.environ.setdefault("NUMBA_DISABLE_JIT", "1")


class _FakeNumbaType:
    """Stands in for numba type objects (nb.f8, nb.i8, ...) and their slicing."""

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self


def _install_fake_numba():
    nb = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    nb.njit = njit
    nb.jit = njit
    nb.cfunc = njit
    nb.vectorize = njit
    nb.guvectorize = njit
    nb.prange = range
    nb.typeof = lambda x: type(x)
    for tname in ("f8", "f4", "i8", "i4", "u8", "u4", "b1", "types"):
        setattr(nb, tname, _FakeNumbaType())
    nb.config = types.SimpleNamespace(DISABLE_JIT=True)
    sys.modules["numba"] = nb


def _install_fake(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


if "numba" not in sys.modules:
    try:
        import numba  # noqa: F401
    except ImportError:
        _install_fake_numba()

def _install_fake_shapely():
    """Minimal shapely: enough for the reference's no-fracture meshing path,
    where geometry objects are constructed but intersections never queried
    (the fracture-edge loop is empty)."""
    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")

    class _Geom:
        def __init__(self, *args, **kwargs):
            self._args = args

        def intersection(self, other):
            raise NotImplementedError(
                "fake shapely: intersections unavailable (install shapely)"
            )

        def touches(self, other):
            raise NotImplementedError("fake shapely")

        @property
        def coords(self):
            return []

        @property
        def length(self):
            return 0.0

    geometry.Polygon = _Geom
    geometry.LineString = _Geom
    geometry.MultiLineString = _Geom
    geometry.Point = _Geom
    shapely.geometry = geometry
    shapely.__version__ = "2.0.0"
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry


for _name in ("meshio", "gmsh"):
    if _name not in sys.modules:
        try:
            __import__(_name)
        except ImportError:
            _install_fake(_name)

if "shapely" not in sys.modules:
    try:
        import shapely  # noqa: F401
    except ImportError:
        _install_fake_shapely()

_REF = "/root/reference/src"
if _REF not in sys.path:
    sys.path.insert(0, _REF)

import porepy as pp  # noqa: E402

__all__ = ["pp"]
