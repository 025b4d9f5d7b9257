"""Geometry mapping helpers: tangents, normals, plane rotations.

Host-side (numpy) setup-time kernels; parity counterpart of reference
``geometry/map_geometry.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "compute_tangent",
    "compute_normal",
    "project_plane_matrix",
    "project_line_matrix",
    "rotation_matrix_from_vectors",
]


def compute_tangent(pts: np.ndarray, check: bool = True) -> np.ndarray:
    """Unit tangent of a collinear point cloud ``(3, n)``.

    The tangent is the mean of the (nonzero) difference vectors from the
    point-cloud mean, normalized.
    """
    pts = np.asarray(pts, dtype=float)
    mean = pts.mean(axis=1, keepdims=True)
    diff = pts - mean
    norms = np.linalg.norm(diff, axis=0)
    good = norms > 1e-12 * max(1.0, norms.max())
    if not np.any(good):
        raise ValueError("Cannot compute tangent of coincident points")
    # Orient all difference vectors consistently before averaging.
    d = diff[:, good]
    ref = d[:, 0]
    sgn = np.sign(ref @ d)
    sgn[sgn == 0] = 1.0
    tangent = (d * sgn).mean(axis=1)
    nrm = np.linalg.norm(tangent)
    if check and nrm < 1e-12:
        raise ValueError("Degenerate tangent")
    return tangent / nrm


def compute_normal(pts: np.ndarray, tol: float = 1e-5) -> np.ndarray:
    """Unit normal of a (nearly) planar point cloud ``(3, n)``.

    Computed as the smallest principal direction of the centered cloud.
    """
    pts = np.asarray(pts, dtype=float)
    if pts.shape[1] < 3:
        raise ValueError("Need at least 3 points to compute a normal")
    centered = pts - pts.mean(axis=1, keepdims=True)
    # SVD of the 3 x n cloud: left singular vector of the smallest singular
    # value spans the normal direction.
    u, s, _ = np.linalg.svd(centered, full_matrices=True)
    normal = u[:, -1]
    # Deterministic sign: make the largest-magnitude entry positive.
    k = np.argmax(np.abs(normal))
    if normal[k] < 0:
        normal = -normal
    return normal


def rotation_matrix_from_vectors(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix R with R @ a || b for unit vectors a, b (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        if c > 0:
            return np.eye(3)
        # 180-degree rotation about any axis orthogonal to a.
        axis = np.eye(3)[np.argmin(np.abs(a))]
        v = np.cross(a, axis)
        v /= np.linalg.norm(v)
        return 2.0 * np.outer(v, v) - np.eye(3)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx / (1.0 + c)


def project_plane_matrix(
    pts: np.ndarray,
    normal: np.ndarray | None = None,
    reference: np.ndarray | None = None,
) -> np.ndarray:
    """Rotation matrix mapping the plane of ``pts`` onto the xy-plane."""
    if normal is None:
        normal = compute_normal(pts)
    else:
        normal = np.asarray(normal, dtype=float)
        normal = normal / np.linalg.norm(normal)
    if reference is None:
        reference = np.array([0.0, 0.0, 1.0])
    return rotation_matrix_from_vectors(normal, reference)


def project_line_matrix(pts: np.ndarray) -> np.ndarray:
    """Rotation matrix mapping the line of ``pts`` onto the x-axis."""
    tangent = compute_tangent(pts)
    return rotation_matrix_from_vectors(tangent, np.array([1.0, 0.0, 0.0]))
