"""Tpsa (two-point stress approximation): matrix parity vs reference."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.numerics.fv.tpsa import Tpsa
from tests.conftest import requires_reference

ALL_KEYS = [
    "stress",
    "stress_rotation",
    "stress_total_pressure",
    "rotation_displacement",
    "rotation_rotation",
    "solid_mass_total_pressure",
    "solid_mass_displacement",
    "bound_stress",
    "bound_rotation_displacement",
    "bound_mass_displacement",
    "bound_displacement_cell",
    "bound_displacement_face",
    "bound_displacement_rotation_cell",
    "bound_displacement_solid_pressure_cell",
]


def _discretize_both(ref_pp, nx, bc_kind, seed=21):
    rng = np.random.default_rng(seed)
    g = pt.CartGrid(list(nx))
    g.compute_geometry()
    gr = ref_pp.CartGrid(np.array(nx))
    gr.compute_geometry()
    nc = g.num_cells
    mu = rng.uniform(0.5, 2.0, nc)
    lmbda = rng.uniform(0.5, 2.0, nc)
    bf = g.get_boundary_faces()
    if bc_kind == "mixed":
        cond = ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    else:
        cond = [bc_kind] * bf.size
    d = pt.initialize_data(
        {},
        "mech",
        {
            "fourth_order_tensor": pt.FourthOrderTensor(mu, lmbda),
            "bc": pt.BoundaryConditionVectorial(g, bf, cond),
        },
    )
    dr = ref_pp.initialize_data(
        {},
        "mech",
        {
            "fourth_order_tensor": ref_pp.FourthOrderTensor(mu, lmbda),
            "bc": ref_pp.BoundaryConditionVectorial(gr, bf, cond),
        },
    )
    Tpsa("mech").discretize(g, d)
    ref_pp.Tpsa("mech").discretize(gr, dr)
    return (
        d[pt.DISCRETIZATION_MATRICES]["mech"],
        dr[ref_pp.DISCRETIZATION_MATRICES]["mech"],
    )


@requires_reference
@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]], ids=["2d", "3d"])
@pytest.mark.parametrize("bc_kind", ["mixed", "dir", "neu", "rob"])
def test_tpsa_matrix_parity(ref_pp, nx, bc_kind):
    md, mdr = _discretize_both(ref_pp, nx, bc_kind)
    for key in ALL_KEYS:
        A = sps.csr_matrix(md[key])
        B = sps.csr_matrix(mdr[key])
        assert A.shape == B.shape, key
        diff = abs(A - B)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key
