"""Stress-intensity-factor estimation by displacement correlation.

Parity counterpart of reference ``numerics/displacement_correlation.py``
(Nejati et al., "On the use of quarter-point tetrahedral finite elements
in linear elastic fracture mechanics", EFM 144 (2015)): SIFs at fracture
tips are recovered from the relative displacement of the fracture walls
at a correlation point a distance ``rm`` behind the tip.

The reference's entry point consumes the monolithic ``FracturedMpsa``
displacement layout; here the input is the displacement jump per
fracture cell (the natural quantity in the mortar-based models), which
is what the reference's model-facing variant also uses
(``conforming_propagation.py:164``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sif_from_delta_u",
    "determine_onset",
    "estimate_rm",
    "faces_to_open",
]


def sif_from_delta_u(d_u, rm, mu, kappa) -> np.ndarray:
    """SIFs from relative wall displacements in tip-local coordinates.

    ``d_u`` is ``(dim, n_tips)`` with rows [sliding (perp to tip, in
    plane), opening (normal), tearing (along tip, 3d)]; ``rm`` the
    correlation distances. Nejati et al. eq. 19 (reference
    ``displacement_correlation.py:168-189``).
    """
    d_u = np.asarray(d_u, float)
    rm = np.asarray(rm, float).ravel()
    dim = d_u.shape[0]
    scale = np.sqrt(2.0 * np.pi / rm)
    sifs = np.zeros_like(d_u)
    sifs[0] = scale * mu / (kappa + 1.0) * d_u[1]
    sifs[1] = scale * mu / (kappa + 1.0) * d_u[0]
    if dim == 3:
        sifs[2] = scale * mu / 4.0 * d_u[2]
    return sifs


def determine_onset(sifs, critical_values) -> np.ndarray:
    """Mode-I onset: |K_I| exceeds its critical value (reference
    ``displacement_correlation.py:150``)."""
    return np.abs(np.asarray(sifs)[0]) > np.asarray(critical_values)[0]


def estimate_rm(sd, **kw) -> np.ndarray:
    """Optimal correlation distance ~ 0.8x the local tip mesh size
    (reference ``displacement_correlation.py:371-395``)."""
    k = kw.get("rm_factor", 0.8)
    faces = np.flatnonzero(sd.tags["tip_faces"])
    if sd.dim >= 2:
        return k * sd.face_areas[faces]
    cells = sd.cell_faces[faces].nonzero()[1]
    return k * sd.cell_volumes[cells]


def faces_to_open(mdg, model, critical_sifs, **kw):
    """Host faces to split per fracture, from the current solution of a
    mortar-based mechanics ``model`` (provides ``equation_system``,
    ``interface_displacement_variable``, ``solid``, ``nd``).

    Returns ``(faces_per_fracture, sifs_per_fracture)`` like the reference
    entry point (``displacement_correlation.py:20``).
    """
    from porepy_tpu.numerics.fracture_deformation.conforming_propagation import (
        ConformingFracturePropagation,
    )

    helper = ConformingFracturePropagation.__new__(ConformingFracturePropagation)
    helper.__dict__.update(
        {"mdg": mdg, "params": {"critical_sifs": critical_sifs, **kw}}
    )
    for attr in (
        "equation_system",
        "interface_displacement_variable",
        "solid",
        "nd",
    ):
        setattr(helper, attr, getattr(model, attr))

    faces_out, sifs_out = [], []
    for intf in mdg.interfaces():
        sd_h, sd_l = mdg.interface_to_subdomain_pair(intf)
        if sd_h.dim != helper.nd or sd_l.dim != helper.nd - 1:
            continue
        sifs, tip_faces, bases = helper._displacement_correlation(sd_l, intf)
        onset = determine_onset(sifs, critical_sifs)
        grow = tip_faces[onset]
        host = helper._select_host_faces(
            sd_h, sd_l, grow, bases[:, :, onset], np.zeros(int(onset.sum()))
        )
        faces_out.append(np.unique(host))
        sifs_out.append(sifs)
    return faces_out, sifs_out
