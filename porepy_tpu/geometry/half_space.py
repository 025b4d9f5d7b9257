"""Half-space predicates (reference ``geometry/half_space.py``)."""

from __future__ import annotations

import numpy as np

__all__ = ["point_inside_half_space_intersection"]


def point_inside_half_space_intersection(
    n: np.ndarray, x0: np.ndarray, pts: np.ndarray
) -> np.ndarray:
    """True for points inside ALL half spaces ``(x - x0_i) . n_i <= 0``
    (normals point out of the half spaces)."""
    n = np.atleast_2d(n)
    x0 = np.atleast_2d(x0)
    pts = np.atleast_2d(pts)
    if n.shape[0] != 3 or x0.shape[0] != 3 or pts.shape[0] != 3:
        raise ValueError("n, x0 and pts must be 3 x k arrays")
    if n.shape[1] != x0.shape[1]:
        raise ValueError("One base point per normal vector required")
    inside = np.ones(pts.shape[1], dtype=bool)
    for i in range(n.shape[1]):
        d = (pts - x0[:, i : i + 1]).T @ n[:, i]
        inside &= d <= 0
    return inside
