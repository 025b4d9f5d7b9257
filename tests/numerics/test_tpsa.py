"""Tpsa (two-point stress approximation): matrix parity vs reference."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.numerics.fv.tpsa import Tpsa


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


def _case_inputs(nx, bc_kind, seed=21):
    rng = np.random.default_rng(seed)
    nc = int(np.prod(nx))
    mu = rng.uniform(0.5, 2.0, nc)
    lmbda = rng.uniform(0.5, 2.0, nc)
    return mu, lmbda


def _bc_cond(bf, bc_kind):
    if bc_kind == "mixed":
        return ["dir" if i % 2 == 0 else "neu" for i in range(bf.size)]
    return [bc_kind] * bf.size


@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]], ids=["2d", "3d"])
@pytest.mark.parametrize("bc_kind", ["mixed", "dir", "neu", "rob"])
def test_tpsa_matrix_parity(golden, nx, bc_kind):
    mu, lmbda = _case_inputs(nx, bc_kind)
    g = pt.CartGrid(list(nx))
    g.compute_geometry()
    bf = g.get_boundary_faces()
    cond = _bc_cond(bf, bc_kind)
    d = pt.initialize_data(
        {},
        "mech",
        {
            "fourth_order_tensor": pt.FourthOrderTensor(mu, lmbda),
            "bc": pt.BoundaryConditionVectorial(g, bf, cond),
        },
    )
    Tpsa("mech").discretize(g, d)
    md = d[pt.DISCRETIZATION_MATRICES]["mech"]

    def compute(ref_pp):
        gr = ref_pp.CartGrid(np.array(nx))
        gr.compute_geometry()
        dr = ref_pp.initialize_data(
            {},
            "mech",
            {
                "fourth_order_tensor": ref_pp.FourthOrderTensor(mu, lmbda),
                "bc": ref_pp.BoundaryConditionVectorial(gr, bf, cond),
            },
        )
        ref_pp.Tpsa("mech").discretize(gr, dr)
        return {
            key: sps.csr_matrix(dr[ref_pp.DISCRETIZATION_MATRICES]["mech"][key])
            for key in ALL_KEYS
        }

    mdr = golden(compute)
    for key in ALL_KEYS:
        A = sps.csr_matrix(md[key])
        B = sps.csr_matrix(mdr[key])
        assert A.shape == B.shape, key
        diff = abs(A - B)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key


@pytest.mark.parametrize(
    "tweak", ["basis", "robin_offdiag", "robin_mixed"]
)
def test_tpsa_bc_restrictions_match_reference(golden, tweak):
    """The three unsupported BC envelopes raise NotImplementedError in BOTH
    frameworks: non-trivial basis, non-diagonal Robin weight, and Robin
    mixed with Dirichlet/Neumann on one face (reference
    ``numerics/fv/tpsa.py:572-618`` raises for exactly the same cases —
    the supported envelope is at parity, not reduced)."""

    def build(mod):
        g = mod.CartGrid([3, 3])
        g.compute_geometry()
        C = mod.FourthOrderTensor(
            np.ones(g.num_cells), np.ones(g.num_cells)
        )
        bf = g.get_boundary_faces()
        bc = mod.BoundaryConditionVectorial(g, bf, ["rob"] * bf.size)
        if tweak == "basis":
            bc.basis[0, 1, :] = 0.5
        elif tweak == "robin_offdiag":
            bc.robin_weight[0, 1, :] = 0.3
        else:
            bc.is_rob[0, bf[0]] = False
            bc.is_neu[0, bf[0]] = True
        return g, C, bc

    g, C, bc = build(pt)
    d = pt.initialize_data(
        {}, "m", {"fourth_order_tensor": C, "bc": bc}
    )
    with pytest.raises(NotImplementedError):
        pt.Tpsa("m").discretize(g, d)

    def compute(ref_pp):
        gr, Cr, bcr = build(ref_pp)
        dr = ref_pp.initialize_data(
            {}, "m", {"fourth_order_tensor": Cr, "bc": bcr}
        )
        with pytest.raises(NotImplementedError):
            ref_pp.Tpsa("m").discretize(gr, dr)
        return {"reference_raises": np.array(1)}

    assert golden(compute)["reference_raises"] == 1
