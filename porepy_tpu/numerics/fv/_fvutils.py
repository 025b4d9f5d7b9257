"""Small shared helpers for the FV discretizations.

The interaction-region machinery lives in ``regions.py``/``local_solves.py``
(the reference's ``SubcellTopology``/``ExcludeBoundaries`` equivalents are
organized per region there).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "determine_eta",
    "subface_numbering",
    "boundary_to_sub_boundary",
    "map_subface_to_face",
]


def subface_numbering(sd):
    """Canonical unique-subface numbering: subface ``j`` is the ``j``-th
    entry of ``sd.face_nodes`` in CSC (face-major) order, i.e. the (face,
    node) pair at position ``j`` of ``face_nodes.indices``. Identical to
    the reference's ``SubcellTopology.subfno_unique`` ids for non-periodic
    grids (reference ``numerics/fv/_fvutils.py:21-172``), so per-subface
    boundary conditions transfer one-to-one between the frameworks.

    Returns ``(fno, nno)``: face and node of each unique subface.
    """
    fn = sd.face_nodes.tocsc()
    fno = np.repeat(np.arange(sd.num_faces), np.diff(fn.indptr))
    return fno, fn.indices.copy()


def boundary_to_sub_boundary(bound, sd):
    """Expand a face-wise boundary condition to the unique subfaces of
    ``sd`` (reference ``_fvutils.boundary_to_sub_boundary:1465``). All
    per-face arrays are replicated onto the face's subfaces in the
    :func:`subface_numbering` order; the result can be edited per subface
    and passed to MPSA/MPFA for a subface-resolved discretization."""
    fno, _ = subface_numbering(sd)
    bound = bound.copy()
    bound.is_dir = np.atleast_2d(bound.is_dir)[:, fno].squeeze()
    bound.is_neu = np.atleast_2d(bound.is_neu)[:, fno].squeeze()
    bound.is_rob = np.atleast_2d(bound.is_rob)[:, fno].squeeze()
    bound.is_per = np.atleast_2d(bound.is_per)[:, fno].squeeze()
    if hasattr(bound, "is_internal"):
        bound.is_internal = np.atleast_2d(bound.is_internal)[:, fno].squeeze()
    if bound.robin_weight.ndim == 3:
        bound.robin_weight = bound.robin_weight[:, :, fno]
        bound.basis = bound.basis[:, :, fno]
    else:
        bound.robin_weight = bound.robin_weight[fno]
        bound.basis = bound.basis[fno]
    bound.num_faces = fno.size
    if hasattr(bound, "bf"):
        bound.bf = np.where(np.isin(fno, bound.bf))[0]
    return bound


def map_subface_to_face(sd, nd: int = 1):
    """Sparse ``(num_faces * nd, num_subfaces * nd)`` summation map from
    unique subfaces to faces (reference ``_fvutils.map_hf_2_f``)."""
    import scipy.sparse as sps

    fno, _ = subface_numbering(sd)
    if nd == 1:
        rows, cols = fno, np.arange(fno.size)
    else:
        rows = (fno[None] * nd + np.arange(nd)[:, None]).ravel()
        cols = (
            np.arange(fno.size)[None] * nd + np.arange(nd)[:, None]
        ).ravel()
    return sps.coo_matrix(
        (np.ones(rows.size), (rows, cols)),
        shape=(sd.num_faces * nd, fno.size * nd),
    ).tocsr()


def determine_eta(sd) -> float:
    """Default continuity-point parameter for MPFA/MPSA: 1/3 on simplex
    grids, 0 otherwise (reference ``_fvutils.determine_eta:280``)."""
    simplex_names = ("TriangleGrid", "TetrahedralGrid")
    name = type(sd).__name__
    history = " ".join(str(h) for h in getattr(sd, "history", []))
    if any(s in name or s in history for s in simplex_names):
        return 1.0 / 3.0
    return 0.0
