"""MPFA subface-resolved boundary conditions: consistency with the
face-mode discretization and an analytic mixed-type patch test (the
reference's ``subface_rhs`` path, ``numerics/fv/mpfa.py:767``; like MPSA's,
its v1.11 implementation is unusable with Dirichlet subfaces, so parity is
established against face mode and exact solutions instead)."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.numerics.fv._fvutils import (
    boundary_to_sub_boundary,
    map_subface_to_face,
    subface_numbering,
)


def _face_to_sub_values(g, kind):
    fno, _ = subface_numbering(g)
    nnpf = np.diff(g.face_nodes.tocsc().indptr)
    wgt = np.ones(fno.size) if kind == "dir" else 1.0 / nnpf[fno]
    return sps.coo_matrix(
        (wgt, (np.arange(fno.size), fno)),
        shape=(fno.size, g.num_faces),
    ).tocsr()


@pytest.mark.parametrize("nx", [[5, 4], [3, 3, 2]])
@pytest.mark.parametrize("kind", ["dir", "neu"])
def test_mpfa_subface_expansion_matches_face_mode(nx, kind):
    rng = np.random.default_rng(8)
    g = pt.CartGrid(nx)
    g.compute_geometry()
    perm = rng.uniform(0.5, 2.0, g.num_cells)
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, [kind] * bf.size)
    dd = pt.initialize_data(
        {},
        "f",
        {
            "second_order_tensor": pt.SecondOrderTensor(perm),
            "bc": bc,
            "ambient_dimension": g.dim,
        },
    )
    pt.Mpfa("f").discretize(g, dd)
    mf = dd[pt.DISCRETIZATION_MATRICES]["f"]

    sub = boundary_to_sub_boundary(bc, g)
    ds = pt.initialize_data(
        {},
        "f",
        {
            "second_order_tensor": pt.SecondOrderTensor(perm),
            "bc": sub,
            "ambient_dimension": g.dim,
        },
    )
    pt.Mpfa("f").discretize(g, ds)
    ms = ds[pt.DISCRETIZATION_MATRICES]["f"]

    hf2f = map_subface_to_face(g, 1)
    P = _face_to_sub_values(g, kind)
    n_subf = g.face_nodes.nnz
    assert ms["flux"].shape == (n_subf, g.num_cells)
    assert ms["bound_flux"].shape == (n_subf, n_subf)
    assert abs(hf2f @ ms["flux"] - mf["flux"]).max() < 1e-12
    assert abs(hf2f @ ms["bound_flux"] @ P - mf["bound_flux"]).max() < 1e-12
    assert abs(ms["bound_pressure_cell"] - mf["bound_pressure_cell"]).max() < 1e-12
    assert (
        abs(ms["bound_pressure_face"] @ P - mf["bound_pressure_face"]).max()
        < 1e-12
    )
    assert abs(hf2f @ ms["vector_source"] - mf["vector_source"]).max() < 1e-12


@pytest.mark.parametrize("nx", [[5, 4], [3, 3, 2]])
def test_mpfa_subface_mixed_types_patch(nx):
    """Linear pressure reproduced exactly with Dirichlet/Neumann types
    alternating per subface (unreachable with face-wise conditions)."""
    g = pt.CartGrid(nx, np.asarray(nx, dtype=float) / max(nx))
    g.compute_geometry()
    perm = np.full(g.num_cells, 1.7)
    bf = g.get_boundary_faces()
    bc = pt.BoundaryCondition(g, bf, ["dir"] * bf.size)
    sub = boundary_to_sub_boundary(bc, g)
    fno, _ = subface_numbering(g)
    nnpf = np.diff(g.face_nodes.tocsc().indptr)
    on_bnd = np.isin(fno, bf)
    j = np.arange(sub.num_faces)
    neu_pick = on_bnd & (j % 2 == 0)
    sub.is_dir[neu_pick] = False
    sub.is_neu[neu_pick] = True
    ds = pt.initialize_data(
        {},
        "f",
        {
            "second_order_tensor": pt.SecondOrderTensor(perm),
            "bc": sub,
            "ambient_dimension": g.dim,
        },
    )
    pt.Mpfa("f").discretize(g, ds)
    ms = ds[pt.DISCRETIZATION_MATRICES]["f"]

    rng = np.random.default_rng(12)
    a = rng.uniform(-1.0, 1.0, g.dim)
    pc = a @ g.cell_centers[: g.dim]
    # Exact flux through a subface (stored-normal orientation, area share
    # 1/nnpf): q = -K grad p . n / nn. Neumann values are the OUTWARD
    # subface flux.
    sgn_bf = np.zeros(g.num_faces)
    s, _ = g.signs_and_cells_of_boundary_faces(bf)
    sgn_bf[bf] = s
    q_sub = -perm[0] * (a @ g.face_normals[: g.dim, fno]) / nnpf[fno]
    ub = np.where(
        sub.is_dir,
        a @ g.face_centers[: g.dim, fno],
        q_sub * sgn_bf[fno],
    )
    q = ms["flux"] @ pc + ms["bound_flux"] @ ub
    assert np.abs(q - q_sub).max() < 1e-10
    # Pressure trace at faces.
    tr = ms["bound_pressure_cell"] @ pc + ms["bound_pressure_face"] @ ub
    tr_exact = a @ g.face_centers[: g.dim]
    assert np.abs(tr - tr_exact).max() < 1e-10
