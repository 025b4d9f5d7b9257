"""Grid core tests: geometry invariants + direct parity with the reference.

Parity strategy mirrors the reference test suite (reference
``tests/grids/test_grid.py``): identical constructor inputs must give
identical topology (incidence matrices) and geometry (centers, volumes,
normals) to machine precision.
"""

import numpy as np
import pytest

import porepy_tpu as pp
from tests.conftest import assert_sparse_equal


CART_CASES = [
    ([3], None),
    ([5], [2.5]),
    ([3, 3], None),
    ([4, 3], [2.0, 1.0]),
    ([2, 3, 4], None),
    ([3, 2, 2], [1.5, 2.0, 0.5]),
]

TENSOR_CASES = [
    (np.array([0.0, 0.5, 1.2, 3.0]), None, None),
    (np.array([0.0, 1.0, 1.5]), np.array([-1.0, 0.0, 2.0]), None),
    (
        np.array([0.0, 1.0, 1.5]),
        np.array([0.0, 0.5, 1.0]),
        np.array([0.0, 0.25, 0.75, 1.0]),
    ),
]


class TestGeometryInvariants:
    @pytest.mark.parametrize("nx,phys", CART_CASES)
    def test_divergence_of_constant_field_is_zero_inside(self, nx, phys):
        g = pp.CartGrid(nx, phys)
        g.compute_geometry()
        # Outward flux of a constant vector field sums to zero per cell
        # (discrete divergence theorem).
        for d in range(g.dim):
            flux = g.face_normals[d]
            div = g.divergence(1) @ flux
            assert np.allclose(div, 0.0, atol=1e-12)

    @pytest.mark.parametrize("nx,phys", CART_CASES)
    def test_total_volume(self, nx, phys):
        g = pp.CartGrid(nx, phys)
        g.compute_geometry()
        expected = np.prod(phys if phys is not None else nx)
        assert np.isclose(g.cell_volumes.sum(), expected)

    def test_normals_have_face_area_length(self):
        g = pp.CartGrid([3, 4, 5], [1.0, 2.0, 3.0])
        g.compute_geometry()
        assert np.allclose(
            np.linalg.norm(g.face_normals, axis=0), g.face_areas
        )

    def test_normal_sign_convention(self):
        # Normal must point out of the cell carrying +1 in cell_faces.
        g = pp.CartGrid([4, 3, 2])
        g.compute_geometry()
        import scipy.sparse as sps

        fi, ci, sgn = sps.find(g.cell_faces)
        v = g.face_centers[:, fi] - g.cell_centers[:, ci]
        dots = np.einsum("ij,ij->j", v, g.face_normals[:, fi]) * sgn
        assert np.all(dots > 0)


def _pack_ref_grid(theirs):
    """Reference grid -> golden-storable dict."""
    theirs.compute_geometry()
    return {
        "dims": np.array(
            [theirs.dim, theirs.num_cells, theirs.num_faces, theirs.num_nodes]
        ),
        "nodes": theirs.nodes,
        "cell_faces": theirs.cell_faces.tocsr(),
        "face_nodes": theirs.face_nodes.astype(int).tocsr(),
        "face_nodes_indices": theirs.face_nodes.indices,
        "cell_centers": theirs.cell_centers,
        "cell_volumes": theirs.cell_volumes,
        "face_centers": theirs.face_centers,
        "face_normals": theirs.face_normals,
        "face_areas": theirs.face_areas,
        "domain_boundary_faces": theirs.tags["domain_boundary_faces"],
        "domain_boundary_nodes": theirs.tags["domain_boundary_nodes"],
    }


def _compare_packed(ours, ref):
    ours.compute_geometry()
    dims = np.asarray(ref["dims"])
    assert ours.dim == dims[0]
    assert ours.num_cells == dims[1]
    assert ours.num_faces == dims[2]
    assert ours.num_nodes == dims[3]
    assert np.allclose(ours.nodes, ref["nodes"])
    assert_sparse_equal(ours.cell_faces, ref["cell_faces"])
    assert_sparse_equal(ours.face_nodes.astype(int), ref["face_nodes"])
    # Node ordering within faces is semantically meaningful.
    assert np.array_equal(
        ours.face_nodes.indices, np.asarray(ref["face_nodes_indices"])
    )
    assert np.allclose(ours.cell_centers, ref["cell_centers"])
    assert np.allclose(ours.cell_volumes, ref["cell_volumes"])
    assert np.allclose(ours.face_centers, ref["face_centers"])
    assert np.allclose(ours.face_normals, ref["face_normals"])
    assert np.allclose(ours.face_areas, ref["face_areas"])
    for key in ("domain_boundary_faces", "domain_boundary_nodes"):
        assert np.array_equal(ours.tags[key], np.asarray(ref[key]))


class TestReferenceParity:
    @pytest.mark.parametrize("nx,phys", CART_CASES)
    def test_cart_grid_topology_and_geometry(self, golden, nx, phys):
        ours = pp.CartGrid(nx, phys)
        ref = golden(
            lambda ref_pp: _pack_ref_grid(ref_pp.CartGrid(np.asarray(nx), phys))
        )
        _compare_packed(ours, ref)

    @pytest.mark.parametrize("x,y,z", TENSOR_CASES)
    def test_tensor_grid(self, golden, x, y, z):
        ours = pp.TensorGrid(x, y, z)
        ref = golden(lambda ref_pp: _pack_ref_grid(ref_pp.TensorGrid(x, y, z)))
        _compare_packed(ours, ref)

    def test_cell_faces_as_dense(self, golden):
        ours = pp.CartGrid([3, 2])
        ref = golden(
            lambda ref_pp: {
                "dense": ref_pp.CartGrid(np.array([3, 2])).cell_faces_as_dense()
            }
        )
        assert np.array_equal(ours.cell_faces_as_dense(), ref["dense"])

    def test_divergence_and_trace(self, golden):
        ours = pp.CartGrid([3, 2, 2])
        ours.compute_geometry()

        def compute(ref_pp):
            theirs = ref_pp.CartGrid(np.array([3, 2, 2]))
            theirs.compute_geometry()
            out = {}
            for dim in (1, 3):
                out[f"div_{dim}"] = theirs.divergence(dim).tocsr()
                out[f"trace_{dim}"] = theirs.trace(dim).tocsr()
            return out

        ref = golden(compute)
        for dim in (1, 3):
            assert_sparse_equal(ours.divergence(dim), ref[f"div_{dim}"])
            assert_sparse_equal(ours.trace(dim), ref[f"trace_{dim}"])

    def test_cell_nodes(self, golden):
        ours = pp.CartGrid([3, 2, 2])
        ref = golden(
            lambda ref_pp: {
                "cn": ref_pp.CartGrid(np.array([3, 2, 2]))
                .cell_nodes()
                .astype(int)
                .tocsr()
            }
        )
        assert_sparse_equal(ours.cell_nodes().astype(int), ref["cn"])
