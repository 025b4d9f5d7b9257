"""Partial rediscretization: ``update_discretization`` on MPFA/MPSA must
reproduce a full rediscretization exactly when parameters change locally,
and map matrices exactly under pure renumbering (reference
``_fvutils.partial_update_discretization:1090``, ``mpfa.py:510``)."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt

MPFA_KEYS = [
    "flux",
    "bound_flux",
    "bound_pressure_cell",
    "bound_pressure_face",
    "vector_source",
    "bound_pressure_vector_source",
]
MPSA_KEYS = [
    "stress",
    "bound_stress",
    "bound_displacement_cell",
    "bound_displacement_face",
]


def _grid(nx):
    g = pt.CartGrid(nx)
    g.compute_geometry()
    return g


def _mpfa_data(g, perm):
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu"]
    bc = pt.BoundaryCondition(g, bf, [kinds[i % 2] for i in range(bf.size)])
    return pt.initialize_data(
        {},
        "flow",
        {
            "second_order_tensor": pt.SecondOrderTensor(perm),
            "bc": bc,
            "ambient_dimension": g.dim,
        },
    )


def _mpsa_data(g, mu, lam):
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu"]
    bc = pt.BoundaryConditionVectorial(
        g, bf, [kinds[i % 2] for i in range(bf.size)]
    )
    return pt.initialize_data(
        {},
        "mech",
        {"fourth_order_tensor": pt.FourthOrderTensor(mu, lam), "bc": bc},
    )


@pytest.mark.parametrize("nx", [[7, 6], [4, 3, 3]])
def test_mpfa_partial_update_matches_full(nx):
    g = _grid(nx)
    rng = np.random.default_rng(2)
    perm = rng.uniform(0.5, 2.0, g.num_cells)
    d_old = _mpfa_data(g, perm.copy())
    pt.Mpfa("flow").discretize(g, d_old)

    mod = np.array([0, g.num_cells // 2])
    perm2 = perm.copy()
    perm2[mod] *= 5.0

    # Partial: reuse old matrices, rediscretize only around mod.
    d_old[pt.PARAMETERS]["flow"]["second_order_tensor"] = pt.SecondOrderTensor(
        perm2
    )
    d_old["update_discretization"] = {"modified_cells": mod}
    pt.Mpfa("flow").update_discretization(g, d_old)

    # Full reference.
    d_full = _mpfa_data(g, perm2)
    pt.Mpfa("flow").discretize(g, d_full)
    for key in MPFA_KEYS:
        a = d_old[pt.DISCRETIZATION_MATRICES]["flow"][key]
        b = d_full[pt.DISCRETIZATION_MATRICES]["flow"][key]
        diff = abs(a - b)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key


@pytest.mark.parametrize("nx", [[6, 5], [3, 3, 2]])
def test_mpsa_partial_update_matches_full(nx):
    g = _grid(nx)
    rng = np.random.default_rng(4)
    mu = rng.uniform(0.5, 2.0, g.num_cells)
    lam = rng.uniform(0.5, 2.0, g.num_cells)
    d_old = _mpsa_data(g, mu.copy(), lam.copy())
    pt.Mpsa("mech").discretize(g, d_old)

    mod = np.array([1, g.num_cells - 2])
    mu2, lam2 = mu.copy(), lam.copy()
    mu2[mod] *= 3.0
    lam2[mod] *= 0.5

    d_old[pt.PARAMETERS]["mech"]["fourth_order_tensor"] = pt.FourthOrderTensor(
        mu2, lam2
    )
    d_old["update_discretization"] = {"modified_cells": mod}
    pt.Mpsa("mech").update_discretization(g, d_old)

    d_full = _mpsa_data(g, mu2, lam2)
    pt.Mpsa("mech").discretize(g, d_full)
    for key in MPSA_KEYS:
        a = d_old[pt.DISCRETIZATION_MATRICES]["mech"][key]
        b = d_full[pt.DISCRETIZATION_MATRICES]["mech"][key]
        diff = abs(a - b)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key


def test_mpfa_pure_renumbering_maps_matrices():
    """No modified cells: matrices are mapped through the index maps
    (here a cell/face permutation) without any rediscretization."""
    g = _grid([5, 4])
    rng = np.random.default_rng(6)
    perm = rng.uniform(0.5, 2.0, g.num_cells)
    d = _mpfa_data(g, perm)
    pt.Mpfa("flow").discretize(g, d)
    flux_before = d[pt.DISCRETIZATION_MATRICES]["flow"]["flux"].copy()

    pc = rng.permutation(g.num_cells)
    pf = rng.permutation(g.num_faces)
    cell_map = sps.coo_matrix(
        (np.ones(g.num_cells), (pc, np.arange(g.num_cells)))
    ).tocsr()
    face_map = sps.coo_matrix(
        (np.ones(g.num_faces), (pf, np.arange(g.num_faces)))
    ).tocsr()
    d["update_discretization"] = {"map_cells": cell_map, "map_faces": face_map}
    pt.Mpfa("flow").update_discretization(g, d)
    flux_after = d[pt.DISCRETIZATION_MATRICES]["flow"]["flux"]
    diff = abs(face_map @ flux_before @ cell_map.T - flux_after)
    assert (diff.max() if diff.nnz else 0.0) == 0.0


BIOT_KEYS = [
    "stress",
    "bound_stress",
    "bound_displacement_cell",
    "bound_displacement_face",
]
BIOT_DICT_KEYS = [
    "scalar_gradient",
    "displacement_divergence",
    "boundary_displacement_divergence",
    "mpsa_consistency",
    "bound_displacement_pressure",
]


def _biot_data(g, mu, lam):
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu"]
    bc = pt.BoundaryConditionVectorial(
        g, bf, [kinds[i % 2] for i in range(bf.size)]
    )
    return pt.initialize_data(
        {},
        "mech",
        {
            "fourth_order_tensor": pt.FourthOrderTensor(mu, lam),
            "bc": bc,
            "scalar_vector_mappings": {"flow": 0.8},
        },
    )


@pytest.mark.parametrize("nx", [[6, 5], [3, 3, 2]])
def test_biot_partial_update_matches_full(nx):
    """Biot partial update incl. the cell-row divergence matrices."""
    g = _grid(nx)
    rng = np.random.default_rng(13)
    mu = rng.uniform(0.5, 2.0, g.num_cells)
    lam = rng.uniform(0.5, 2.0, g.num_cells)
    d_old = _biot_data(g, mu.copy(), lam.copy())
    pt.Biot("mech").discretize(g, d_old)

    mod = np.array([2, g.num_cells - 3])
    mu2, lam2 = mu.copy(), lam.copy()
    mu2[mod] *= 2.0
    lam2[mod] *= 0.7

    d_old[pt.PARAMETERS]["mech"]["fourth_order_tensor"] = pt.FourthOrderTensor(
        mu2, lam2
    )
    d_old["update_discretization"] = {"modified_cells": mod}
    pt.Biot("mech").update_discretization(g, d_old)

    d_full = _biot_data(g, mu2, lam2)
    pt.Biot("mech").discretize(g, d_full)
    for key in BIOT_KEYS:
        a = d_old[pt.DISCRETIZATION_MATRICES]["mech"][key]
        b = d_full[pt.DISCRETIZATION_MATRICES]["mech"][key]
        diff = abs(a - b)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key
    for key in BIOT_DICT_KEYS:
        a = d_old[pt.DISCRETIZATION_MATRICES]["mech"][key]["flow"]
        b = d_full[pt.DISCRETIZATION_MATRICES]["mech"][key]["flow"]
        diff = abs(a - b)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key
