"""MPSA parity vs the reference: all four matrices on 2d/3d grids with
mixed vectorial BCs including Robin, plus the MomentumBalance model."""

import numpy as np
import pytest

import porepy_tpu as pt

KEYS = [
    "stress",
    "bound_stress",
    "bound_displacement_cell",
    "bound_displacement_face",
]


def _case(mod, nx, robin):
    rng = np.random.default_rng(3)
    g = mod.CartGrid(list(nx))
    g.compute_geometry()
    nc = g.num_cells
    mu = rng.uniform(0.5, 2.0, nc)
    lmbda = rng.uniform(0.5, 2.0, nc)
    C = mod.FourthOrderTensor(mu, lmbda)
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu", "rob"] if robin else ["dir", "neu"]
    cond = [kinds[i % len(kinds)] for i in range(bf.size)]
    bc = mod.BoundaryConditionVectorial(g, bf, cond)
    return g, C, bc


@pytest.mark.parametrize(
    "nx,robin",
    [([4, 3], False), ([4, 3], True), ([3, 2, 2], False), ([3, 2, 2], True)],
)
def test_mpsa_matrix_parity(golden, nx, robin):
    g, C, bc = _case(pt, nx, robin)
    d = pt.initialize_data({}, "m", {"fourth_order_tensor": C, "bc": bc})
    pt.Mpsa("m").discretize(g, d)

    def compute(ref_pp):
        gr, Cr, bcr = _case(ref_pp, nx, robin)
        dr = ref_pp.initialize_data(
            {}, "m", {"fourth_order_tensor": Cr, "bc": bcr}
        )
        ref_pp.Mpsa("m").discretize(gr, dr)
        return {
            key: dr[ref_pp.DISCRETIZATION_MATRICES]["m"][key] for key in KEYS
        }

    ref = golden(compute)
    for key in KEYS:
        a = d[pt.DISCRETIZATION_MATRICES]["m"][key]
        b = ref[key]
        diff = abs(a - b)
        mx = diff.max() if diff.nnz else 0.0
        scale = max(abs(b).max(), 1e-300)
        assert mx / scale < 1e-10, (key, mx)


def test_momentum_balance_parity(golden):
    def make(mod, base):
        class M(base):
            def bc_values_displacement(self, bg):
                vals = np.zeros((self.nd, bg.num_cells))
                vals[1] = -0.01 * bg.cell_centers[1]
                return vals.ravel("F")

            def initialize_data_saving(self):
                pass

            def save_data_time_step(self):
                pass

        params = {
            "grid_type": "cartesian",
            "meshing_arguments": {"cell_size": 0.25},
            "material_constants": {
                "solid": mod.SolidConstants(shear_modulus=1.0, lame_lambda=1.0)
            },
        }
        return M(params), params

    m, p1 = make(pt, pt.MomentumBalance)
    pt.run_time_dependent_model(m, p1)
    u_o = m.equation_system.get_variable_values(["u"], time_step_index=0)

    def compute(ref_pp):
        r, p2 = make(ref_pp, ref_pp.MomentumBalance)
        ref_pp.run_time_dependent_model(r, p2)
        return {
            "u": r.equation_system.get_variable_values(
                ["u"], time_step_index=0
            )
        }

    u_r = golden(compute)["u"]
    assert np.abs(u_o - u_r).max() < 1e-12


def test_momentum_balance_rigid_motion():
    """Uniform translation BCs produce a uniform displacement field."""

    class M(pt.MomentumBalance):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            vals[0] = 0.5
            return vals.ravel("F")

    params = {"meshing_arguments": {"cell_size": 0.25}}
    m = M(params)
    pt.run_time_dependent_model(m, params)
    u = m.equation_system.get_variable_values(["u"], time_step_index=0)
    ux = u.reshape(-1, 2)[:, 0]
    uy = u.reshape(-1, 2)[:, 1]
    np.testing.assert_allclose(ux, 0.5, atol=1e-10)
    np.testing.assert_allclose(uy, 0.0, atol=1e-10)



# -- subface-resolved boundary conditions -------------------------------------
#
# The reference's own subface path (``numerics/fv/mpsa.py:715``,
# ``subface_rhs``) is broken in v1.11: a subface-sized BC with any
# Dirichlet subface crashes in ``_create_inverse_gradient_matrix``
# (dimension mismatch after ``_eliminate_ncasym``), and an all-Neumann
# subface BC silently falls back to face-level output. Parity testing is
# therefore impossible; these tests instead assert (a) self-consistency
# with the face-mode discretization and (b) exactness on an analytic
# mixed-type patch test.

from porepy_tpu.numerics.fv._fvutils import (  # noqa: E402
    boundary_to_sub_boundary,
    map_subface_to_face,
    subface_numbering,
)


def _face_to_sub_values(g, kind):
    """(num_subfaces*d, num_faces*d) map replicating face values to
    subfaces: copy for Dirichlet, 1/nnpf traction split for Neumann."""
    import scipy.sparse as sps

    d = g.dim
    fno, _ = subface_numbering(g)
    nnpf = np.diff(g.face_nodes.tocsc().indptr)
    wgt = np.ones(fno.size) if kind == "dir" else 1.0 / nnpf[fno]
    rows = (np.arange(fno.size)[None] * d + np.arange(d)[:, None]).ravel()
    cols = (fno[None] * d + np.arange(d)[:, None]).ravel()
    return sps.coo_matrix(
        (np.tile(wgt, d), (rows, cols)),
        shape=(fno.size * d, g.num_faces * d),
    ).tocsr()


@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]])
@pytest.mark.parametrize("kind", ["dir", "neu"])
def test_mpsa_subface_expansion_matches_face_mode(nx, kind):
    rng = np.random.default_rng(5)
    g = pt.CartGrid(nx)
    g.compute_geometry()
    d_ = g.dim
    C = pt.FourthOrderTensor(
        rng.uniform(0.5, 2.0, g.num_cells), rng.uniform(0.5, 2.0, g.num_cells)
    )
    bf = g.get_boundary_faces()
    bc = pt.BoundaryConditionVectorial(g, bf, [kind] * bf.size)
    dd = pt.initialize_data({}, "m", {"fourth_order_tensor": C, "bc": bc})
    pt.Mpsa("m").discretize(g, dd)
    mf = dd[pt.DISCRETIZATION_MATRICES]["m"]

    sub = boundary_to_sub_boundary(bc, g)
    ds = pt.initialize_data({}, "m", {"fourth_order_tensor": C, "bc": sub})
    pt.Mpsa("m").discretize(g, ds)
    ms = ds[pt.DISCRETIZATION_MATRICES]["m"]

    hf2f = map_subface_to_face(g, d_)
    P = _face_to_sub_values(g, kind)
    n_subf = g.face_nodes.nnz
    assert ms["stress"].shape == (n_subf * d_, g.num_cells * d_)
    assert ms["bound_stress"].shape == (n_subf * d_, n_subf * d_)
    assert abs(hf2f @ ms["stress"] - mf["stress"]).max() < 1e-12
    assert (
        abs(hf2f @ ms["bound_stress"] @ P - mf["bound_stress"]).max() < 1e-12
    )
    assert (
        abs(
            ms["bound_displacement_cell"] - mf["bound_displacement_cell"]
        ).max()
        < 1e-12
    )
    assert (
        abs(
            ms["bound_displacement_face"] @ P
            - mf["bound_displacement_face"]
        ).max()
        < 1e-12
    )


@pytest.mark.parametrize("nx", [[4, 3], [3, 2, 2]])
def test_mpsa_subface_mixed_types_patch(nx):
    """Linear displacement reproduced exactly with per-subface mixed
    Dirichlet/Neumann types (the two subfaces of one face get different
    types — unreachable with face-wise conditions). Subfaces at nodes
    with a single subcell (domain corners) stay Dirichlet: a Neumann
    condition there leaves the local rotation unconstrained, a genuine
    MPSA-W singularity (the reference's ``_eliminate_ncasym`` guard,
    reference ``mpsa.py:1932``, does not fire for it either)."""

    g = pt.CartGrid(nx, np.asarray(nx, dtype=float) / max(nx))
    g.compute_geometry()
    d_ = g.dim
    mu_c, la_c = 1.3, 0.8
    C = pt.FourthOrderTensor(
        np.full(g.num_cells, mu_c), np.full(g.num_cells, la_c)
    )
    bf = g.get_boundary_faces()
    bc = pt.BoundaryConditionVectorial(g, bf, ["dir"] * bf.size)
    sub = boundary_to_sub_boundary(bc, g)
    fno, nno = subface_numbering(g)
    nnpf = np.diff(g.face_nodes.tocsc().indptr)
    on_bnd = np.isin(fno, bf)
    cells_per_node = np.asarray(
        (g.cell_nodes() if callable(getattr(g, "cell_nodes", None))
         else g.face_nodes @ abs(g.cell_faces)).astype(bool).sum(axis=1)
    ).ravel()
    j = np.arange(sub.num_faces)
    neu_pick = on_bnd & (j % 2 == 0) & (cells_per_node[nno] >= 2)
    for comp in range(d_):
        sub.is_dir[comp, neu_pick] = False
        sub.is_neu[comp, neu_pick] = True
    ds = pt.initialize_data({}, "m", {"fourth_order_tensor": C, "bc": sub})
    pt.Mpsa("m").discretize(g, ds)
    ms = ds[pt.DISCRETIZATION_MATRICES]["m"]

    rng = np.random.default_rng(11)
    A = rng.uniform(-0.5, 0.5, (d_, d_))
    uc = (A @ g.cell_centers[:d_]).ravel("F")
    # Exact stress sigma = mu (A + A^T) + lambda tr(A) I  (constant).
    sigma = mu_c * (A + A.T) + la_c * np.trace(A) * np.eye(d_)
    # Subface boundary values: displacement at the face center (eta=0 on
    # the boundary) for Dirichlet comps, subface traction share for
    # Neumann comps.
    ub = np.zeros(sub.num_faces * d_)
    fc = g.face_centers[:d_, fno]
    u_at = A @ fc
    # Neumann values are the traction as seen from OUTSIDE the domain:
    # flip where the stored face normal points inward.
    sgn_bf = np.zeros(g.num_faces)
    s, cf_ = g.signs_and_cells_of_boundary_faces(bf)
    sgn_bf[bf] = s
    tr = sigma @ (g.face_normals[:d_, fno] / nnpf[fno]) * sgn_bf[fno]
    for comp in range(d_):
        ub[np.arange(sub.num_faces) * d_ + comp] = np.where(
            sub.is_dir[comp], u_at[comp], tr[comp]
        )
    t_sub = ms["stress"] @ uc + ms["bound_stress"] @ ub
    # Exact subface tractions everywhere.
    t_exact = (sigma @ (g.face_normals[:d_, fno] / nnpf[fno])).ravel("F")
    assert np.abs(t_sub - t_exact).max() < 1e-10
    # Reconstructed face displacement matches the exact field.
    hf = ms["bound_displacement_cell"] @ uc + ms[
        "bound_displacement_face"
    ] @ ub
    u_face_exact = (A @ g.face_centers[:d_]).ravel("F")
    assert np.abs(hf - u_face_exact).max() < 1e-10


@pytest.mark.parametrize("nx", [[5, 4], [3, 3, 2]])
def test_mpsa_region_blocked_assembly_equivalence(nx):
    """The memory-bounding region-block split is exact: forcing many tiny
    blocks reproduces the single-block discretization bit-for-bit."""
    from porepy_tpu.numerics.fv.mpsa import _assemble_mpsa_w

    rng = np.random.default_rng(9)
    g = pt.CartGrid(nx)
    g.compute_geometry()
    C = pt.FourthOrderTensor(
        rng.uniform(0.5, 2.0, g.num_cells), rng.uniform(0.5, 2.0, g.num_cells)
    )
    bf = g.get_boundary_faces()
    kinds = ["dir", "neu", "rob"]
    bc = pt.BoundaryConditionVectorial(
        g, bf, [kinds[i % 3] for i in range(bf.size)]
    )
    one = _assemble_mpsa_w(g, C, bc, None, None)
    many = _assemble_mpsa_w(g, C, bc, None, None, max_block_incidences=40)
    for a, b in zip(one[:4], many[:4]):
        assert a.shape == b.shape
        d = abs(a - b)
        assert (d.max() if d.nnz else 0.0) < 1e-13
