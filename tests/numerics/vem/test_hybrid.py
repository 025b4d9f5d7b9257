"""HybridDualVEM: exactness on linear pressure fields and agreement with
the MVEM saddle-point solve (reference ``numerics/vem/hybrid.py``)."""

import numpy as np
import pytest
import scipy.sparse as sps

import porepy_tpu as pt
from porepy_tpu.params.data import initialize_data
from porepy_tpu.utils import common_constants as cc


def _setup(sd, bc_val_fn, source=None, k_diag=1.0):
    sd.compute_geometry()
    bf = sd.get_all_boundary_faces()
    bc = pt.BoundaryCondition(sd, bf, "dir")
    bc_values = np.zeros(sd.num_faces)
    bc_values[bf] = bc_val_fn(sd.face_centers[:, bf])
    specified = {
        "second_order_tensor": pt.SecondOrderTensor(
            k_diag * np.ones(sd.num_cells)
        ),
        "bc": bc,
        "bc_values": bc_values,
    }
    if source is not None:
        specified["source"] = source
    return initialize_data({}, "flow", specified)


@pytest.mark.parametrize(
    "grid_factory",
    [
        lambda: pt.CartGrid([4, 4], [1.0, 1.0]),
        lambda: pt.StructuredTriangleGrid([3, 3], [1.0, 1.0]),
        lambda: pt.CartGrid([3, 3, 3], [1.0, 1.0, 1.0]),
    ],
)
def test_hybrid_exact_on_linear_pressure(grid_factory):
    sd = grid_factory()
    p_exact = lambda x: 2.0 - x[0] + 0.5 * x[1]  # noqa: E731
    data = _setup(sd, p_exact)
    hybrid = pt.HybridDualVEM("flow")
    H, rhs = hybrid.matrix_rhs(sd, data)
    lam = sps.linalg.spsolve(H, rhs)
    u, p = hybrid.compute_up(sd, lam, data)
    assert np.allclose(p, p_exact(sd.cell_centers), atol=1e-10)
    # The multiplier is the face pressure.
    assert np.allclose(lam, p_exact(sd.face_centers), atol=1e-10)
    # Fluxes reproduce -K grad p . n integrated over faces.
    q_exact = (
        sd.face_normals[0] - 0.5 * sd.face_normals[1]
    )
    assert np.allclose(u, q_exact, atol=1e-10)


def test_hybrid_matches_mvem_with_source():
    sd = pt.StructuredTriangleGrid([4, 4], [1.0, 1.0])
    source = None
    bc_fn = lambda x: np.zeros(x.shape[1])  # noqa: E731
    data_h = _setup(sd, bc_fn)
    data_m = _setup(sd, bc_fn)
    rng = np.random.default_rng(2)
    f = rng.random(sd.num_cells) * sd.cell_volumes
    data_h[cc.PARAMETERS]["flow"]["source"] = f

    hybrid = pt.HybridDualVEM("flow")
    H, rhs = hybrid.matrix_rhs(sd, data_h)
    lam = sps.linalg.spsolve(H, rhs)
    u_h, p_h = hybrid.compute_up(sd, lam, data_h)

    mvem = pt.MVEM("flow")
    mvem.discretize(sd, data_m)
    matrices = data_m[cc.DISCRETIZATION_MATRICES]["flow"]
    mass, div = matrices["mass"], matrices["div"]
    # DualElliptic's saddle form [[M, B^T], [B, 0]] with B = -cell_faces^T
    # solves div u = -f_cell for this right-hand-side convention.
    A = sps.bmat([[mass, div.T], [div, None]], format="csr")
    b = np.concatenate([np.zeros(sd.num_faces), -f])
    # Dirichlet p=0 on the boundary: natural condition in the mixed form.
    x = sps.linalg.spsolve(A, b)
    u_m, p_m = x[: sd.num_faces], x[sd.num_faces :]

    assert np.allclose(p_h, p_m, atol=1e-9)
    assert np.allclose(u_h, u_m, atol=1e-9)


def test_mixed_mass_matrix_and_source():
    """MixedMassMatrix / MixedInvMassMatrix / DualScalarSource on the
    (faces + cells) mixed dof space (reference ``numerics/vem/mass_matrix.py``,
    ``vem_source.py``)."""
    import porepy_tpu as pt
    from porepy_tpu.utils import common_constants as cc

    sd = pt.CartGrid([2, 2], [1.0, 1.0])
    sd.compute_geometry()
    w = 2.0 * np.ones(sd.num_cells)
    data = {
        cc.PARAMETERS: {"flow": {"mass_weight": w, "source": np.arange(4.0)}},
        cc.DISCRETIZATION_MATRICES: {"flow": {}},
    }
    mm = pt.MixedMassMatrix("flow")
    mm.discretize(sd, data)
    M, rhs = mm.assemble_matrix_rhs(sd, data)
    diag = M.diagonal()
    assert np.allclose(diag[: sd.num_faces], 0.0)
    assert np.allclose(diag[sd.num_faces :], sd.cell_volumes * w)
    assert np.allclose(rhs, 0.0)

    inv = pt.MixedInvMassMatrix("flow")
    inv.discretize(sd, data)
    Minv, _ = inv.assemble_matrix_rhs(sd, data)
    assert np.allclose(
        Minv.diagonal()[sd.num_faces :], 1.0 / (sd.cell_volumes * w)
    )

    src = pt.DualScalarSource("flow")
    src.discretize(sd, data)
    A, b = src.assemble_matrix_rhs(sd, data)
    assert A.nnz == 0
    assert np.allclose(b[: sd.num_faces], 0.0)
    assert np.allclose(b[sd.num_faces :], -np.arange(4.0))
