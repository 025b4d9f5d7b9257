"""Fractured structured meshing parity vs the reference: grid topology,
cell connectivity, node coordinates, and mortar projections."""

import numpy as np
import pytest

from porepy_tpu.fracs import meshing
from tests.conftest import requires_reference

CASES_EXACT = [
    ("2d single", [[[1.0, 3.0], [2.0, 2.0]]], [4, 4]),
    ("2d X", [[[1.0, 3.0], [2.0, 2.0]], [[2.0, 2.0], [1.0, 3.0]]], [4, 4]),
    ("2d T", [[[1.0, 3.0], [2.0, 2.0]], [[2.0, 2.0], [2.0, 4.0]]], [4, 4]),
    ("2d through-going", [[[0.0, 4.0], [2.0, 2.0]]], [4, 4]),
    ("2d parallel", [[[1.0, 3.0], [1.0, 1.0]], [[1.0, 3.0], [3.0, 3.0]]], [4, 4]),
    (
        "3d single",
        [[[1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0], [2.0, 2.0, 2.0, 2.0]]],
        [4, 4, 4],
    ),
    (
        "3d crossing",
        [
            [[1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0], [2.0, 2.0, 2.0, 2.0]],
            [[2.0, 2.0, 2.0, 2.0], [1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0]],
        ],
        [4, 4, 4],
    ),
]


@requires_reference
@pytest.mark.parametrize("name,fracs,nx", CASES_EXACT, ids=[c[0] for c in CASES_EXACT])
def test_cart_grid_parity_exact(ref_pp, name, fracs, nx):
    fracs = [np.asarray(f, dtype=float) for f in fracs]
    mdg = meshing.cart_grid(fracs, np.array(nx))
    mdg_ref = ref_pp.meshing.cart_grid(fracs, np.array(nx))

    ours, refs = mdg.subdomains(), mdg_ref.subdomains()
    assert len(ours) == len(refs)
    for sd, sdr in zip(ours, refs):
        assert (sd.dim, sd.num_cells, sd.num_faces, sd.num_nodes) == (
            sdr.dim,
            sdr.num_cells,
            sdr.num_faces,
            sdr.num_nodes,
        )
        d = abs(sd.cell_faces - sdr.cell_faces)
        assert d.nnz == 0 or d.max() == 0
        diff_fn = (sd.face_nodes != sdr.face_nodes)
        assert diff_fn.nnz == 0
        np.testing.assert_allclose(sd.nodes, sdr.nodes)
        np.testing.assert_array_equal(
            sd.tags["fracture_faces"], sdr.tags["fracture_faces"]
        )
        np.testing.assert_array_equal(sd.tags["tip_faces"], sdr.tags["tip_faces"])

    oi, ri = mdg.interfaces(), mdg_ref.interfaces()
    assert len(oi) == len(ri)
    for intf, intfr in zip(oi, ri):
        assert intf.num_cells == intfr.num_cells
        for proj in (
            "mortar_to_primary_int",
            "mortar_to_primary_avg",
            "mortar_to_secondary_int",
            "mortar_to_secondary_avg",
            "primary_to_mortar_int",
            "primary_to_mortar_avg",
            "secondary_to_mortar_int",
            "secondary_to_mortar_avg",
        ):
            d = abs(getattr(intf, proj)() - getattr(intfr, proj)())
            assert d.nnz == 0 or d.max() == 0, proj


@requires_reference
def test_cart_grid_3d_triple_crossing_topology(ref_pp):
    """Triple-crossing 3d fractures: grid/interface counts match the
    reference; grid ordering of split intersection segments may differ (the
    reference's order comes from its network machinery) so only counts and
    per-dimension totals are compared."""
    fracs = [
        np.array([[1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0], [2.0, 2.0, 2.0, 2.0]]),
        np.array([[2.0, 2.0, 2.0, 2.0], [1.0, 3.0, 3.0, 1.0], [1.0, 1.0, 3.0, 3.0]]),
        np.array([[1.0, 3.0, 3.0, 1.0], [2.0, 2.0, 2.0, 2.0], [1.0, 1.0, 3.0, 3.0]]),
    ]
    mdg = meshing.cart_grid(fracs, np.array([4, 4, 4]))
    mdg_ref = ref_pp.meshing.cart_grid(fracs, np.array([4, 4, 4]))
    assert mdg.num_subdomains() == mdg_ref.num_subdomains()
    assert mdg.num_interfaces() == mdg_ref.num_interfaces()
    for dim in range(4):
        ours = mdg.subdomains(dim=dim)
        refs = mdg_ref.subdomains(dim=dim)
        assert len(ours) == len(refs)
        assert sum(g.num_cells for g in ours) == sum(g.num_cells for g in refs)
        assert sum(g.num_faces for g in ours) == sum(g.num_faces for g in refs)


def test_tensor_grid_with_fracture():
    f = np.array([[1.0, 3.0], [2.0, 2.0]])
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = np.array([0.0, 1.0, 2.0, 3.0])
    mdg = meshing.tensor_grid([f], x, y)
    assert mdg.num_subdomains() == 2
    assert mdg.num_interfaces() == 1
    sd1 = mdg.subdomains(dim=1)[0]
    assert sd1.num_cells == 2
