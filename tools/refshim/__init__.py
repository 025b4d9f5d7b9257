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
        # A signature argument (nb.f8[:](...)) is a _FakeNumbaType, which is
        # callable — distinguish it from direct decoration of a function.
        if args and callable(args[0]) and not isinstance(args[0], _FakeNumbaType):
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
    """Functional minimal shapely for the reference's meshing path: clip a
    segment by a CONVEX polygon (the reference only clips fracture lines by
    box/convex domains in its structured 2d preprocessing)."""
    import numpy as _np

    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")

    class LineString:
        def __init__(self, coords):
            self._pts = [(float(p[0]), float(p[1])) for p in coords]

        @property
        def coords(self):
            return list(self._pts)

        @property
        def length(self):
            if len(self._pts) < 2:
                return 0.0
            a, b = _np.array(self._pts[0]), _np.array(self._pts[-1])
            return float(_np.linalg.norm(b - a))

        @property
        def xy(self):
            xs = [p[0] for p in self._pts]
            ys = [p[1] for p in self._pts]
            return (xs, ys)

        def touches(self, poly):
            # True if the whole segment lies on the polygon boundary.
            return all(poly._on_boundary(p) for p in self._pts) and (
                poly._on_boundary(
                    (
                        0.5 * (self._pts[0][0] + self._pts[-1][0]),
                        0.5 * (self._pts[0][1] + self._pts[-1][1]),
                    )
                )
            )

    class MultiLineString:
        def __init__(self, lines):
            self.geoms = [LineString(c) for c in lines]

        def __iter__(self):
            return iter(self.geoms)

    class Polygon:
        def __init__(self, pts):
            pts = list(pts)
            if pts:
                self._v = _np.array([(float(p[0]), float(p[1])) for p in pts])
                # Signed area to determine orientation (positive = CCW).
                x, y = self._v[:, 0], self._v[:, 1]
                self._ccw = (
                    _np.sum(x * _np.roll(y, -1) - _np.roll(x, -1) * y) > 0
                )
            else:
                self._v = _np.zeros((0, 2))
                self._ccw = True

        @property
        def area(self):
            if len(self._v) < 3:
                return 0.0
            x, y = self._v[:, 0], self._v[:, 1]
            return float(
                abs(_np.sum(x * _np.roll(y, -1) - _np.roll(x, -1) * y)) / 2.0
            )

        def _edges(self):
            n = len(self._v)
            for i in range(n):
                yield self._v[i], self._v[(i + 1) % n]

        def _inside(self, a, b, p):
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            return cross >= -1e-12 if self._ccw else cross <= 1e-12

        def _on_boundary(self, p, tol=1e-9):
            p = _np.asarray(p, dtype=float)
            for a, b in self._edges():
                ab = b - a
                t = _np.dot(p - a, ab) / max(_np.dot(ab, ab), 1e-300)
                t = min(max(t, 0.0), 1.0)
                if _np.linalg.norm(a + t * ab - p) < tol:
                    return True
            return False

        def intersection(self, line):
            if isinstance(line, Polygon):
                return self._intersect_polygon(line)
            # Parametric clipping of the segment by each edge half-plane
            # (convex polygon assumed).
            p0 = _np.array(line._pts[0])
            p1 = _np.array(line._pts[-1])
            d = p1 - p0
            t0, t1 = 0.0, 1.0
            for a, b in self._edges():
                # Inward normal relative to orientation.
                e = b - a
                n = _np.array([-e[1], e[0]]) if self._ccw else _np.array([e[1], -e[0]])
                denom = _np.dot(n, d)
                num = _np.dot(n, p0 - a)
                if abs(denom) < 1e-300:
                    if num < -1e-12:
                        return LineString([])  # fully outside
                    continue
                t_hit = -num / denom
                if denom > 0:
                    t0 = max(t0, t_hit)
                else:
                    t1 = min(t1, t_hit)
                if t0 > t1 + 1e-12:
                    return LineString([])
            if t0 > t1:
                return LineString([])
            q0 = p0 + t0 * d
            q1 = p0 + t1 * d
            return LineString([q0, q1])

        def _intersect_polygon(self, other):
            # Sutherland-Hodgman clipping of the other polygon by this one
            # (both convex here: the reference only intersects triangles).
            subject = [tuple(p) for p in other._v]
            for a, b in self._edges():
                if not subject:
                    break
                clipped = []
                prev = subject[-1]
                prev_in = self._inside(a, b, prev)
                for cur in subject:
                    cur_in = self._inside(a, b, cur)
                    if cur_in != prev_in:
                        # Edge crossing: intersect segment prev-cur with the
                        # infinite clip line a-b.
                        p0, d = _np.array(prev), _np.array(cur) - _np.array(prev)
                        e = _np.array(b) - _np.array(a)
                        denom = e[0] * d[1] - e[1] * d[0]
                        if abs(denom) > 1e-300:
                            t = (
                                e[0] * (p0[1] - a[1]) - e[1] * (p0[0] - a[0])
                            ) / -denom
                            clipped.append(tuple(p0 + t * d))
                    if cur_in:
                        clipped.append(cur)
                    prev, prev_in = cur, cur_in
                subject = clipped
            return Polygon(subject)

    class Point:
        def __init__(self, *args):
            self._p = args

    geometry.Polygon = Polygon
    geometry.LineString = LineString
    geometry.MultiLineString = MultiLineString
    geometry.Point = Point
    shapely.geometry = geometry
    shapely.__version__ = "2.0.0"
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry


for _name in ("meshio", "gmsh"):
    if _name not in sys.modules:
        try:
            __import__(_name)
        except ImportError:
            _fake = _install_fake(_name)
            if _name == "meshio":
                # Minimal data holders so the reference Exporter can build
                # its meshio geometry without the real package installed.
                class _CellBlock:
                    def __init__(self, cell_type, data):
                        self.type = cell_type
                        self.data = data

                class _Mesh:
                    def __init__(self, points=None, cells=None, **kw):
                        self.points = points
                        self.cells = cells
                        self.kw = kw

                _fake.CellBlock = _CellBlock
                _fake.Mesh = _Mesh
                _fake.write = lambda *a, **k: None

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
