"""Small shared helpers for the FV discretizations.

The interaction-region machinery lives in ``regions.py``/``local_solves.py``
(the reference's ``SubcellTopology``/``ExcludeBoundaries`` equivalents are
organized per region there).
"""

from __future__ import annotations

__all__ = ["determine_eta"]


def determine_eta(sd) -> float:
    """Default continuity-point parameter for MPFA/MPSA: 1/3 on simplex
    grids, 0 otherwise (reference ``_fvutils.determine_eta:280``)."""
    simplex_names = ("TriangleGrid", "TetrahedralGrid")
    name = type(sd).__name__
    history = " ".join(str(h) for h in getattr(sd, "history", []))
    if any(s in name or s in history for s in simplex_names):
        return 1.0 / 3.0
    return 0.0
