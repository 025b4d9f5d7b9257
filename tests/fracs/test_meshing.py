"""Fractured structured meshing parity vs the reference: grid topology,
cell connectivity, node coordinates, and mortar projections
(golden-backed record/replay)."""

import numpy as np
import pytest

from porepy_tpu.fracs import meshing
from tests.conftest import assert_sparse_equal

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

_PROJS = (
    "mortar_to_primary_int",
    "mortar_to_primary_avg",
    "mortar_to_secondary_int",
    "mortar_to_secondary_avg",
    "primary_to_mortar_int",
    "primary_to_mortar_avg",
    "secondary_to_mortar_int",
    "secondary_to_mortar_avg",
)


@pytest.mark.parametrize("name,fracs,nx", CASES_EXACT, ids=[c[0] for c in CASES_EXACT])
def test_cart_grid_parity_exact(golden, name, fracs, nx):
    fracs = [np.asarray(f, dtype=float) for f in fracs]
    mdg = meshing.cart_grid(fracs, np.array(nx))

    def compute(ref_pp):
        mdg_ref = ref_pp.meshing.cart_grid(fracs, np.array(nx))
        out = {"n_sd": np.array([len(mdg_ref.subdomains())])}
        for i, sdr in enumerate(mdg_ref.subdomains()):
            out[f"sd{i}.meta"] = np.array(
                [sdr.dim, sdr.num_cells, sdr.num_faces, sdr.num_nodes]
            )
            out[f"sd{i}.cell_faces"] = sdr.cell_faces
            out[f"sd{i}.face_nodes"] = sdr.face_nodes.astype(int)
            out[f"sd{i}.nodes"] = np.asarray(sdr.nodes)
            out[f"sd{i}.frac"] = np.asarray(sdr.tags["fracture_faces"])
            out[f"sd{i}.tip"] = np.asarray(sdr.tags["tip_faces"])
        out["n_intf"] = np.array([len(mdg_ref.interfaces())])
        for i, intfr in enumerate(mdg_ref.interfaces()):
            out[f"i{i}.cells"] = np.array([intfr.num_cells])
            for proj in _PROJS:
                out[f"i{i}.{proj}"] = getattr(intfr, proj)()
        return out

    rec = golden(compute)
    ours = mdg.subdomains()
    assert len(ours) == int(rec["n_sd"][0])
    for i, sd in enumerate(ours):
        assert np.array_equal(
            np.array([sd.dim, sd.num_cells, sd.num_faces, sd.num_nodes]),
            rec[f"sd{i}.meta"],
        )
        assert_sparse_equal(sd.cell_faces, rec[f"sd{i}.cell_faces"])
        assert_sparse_equal(sd.face_nodes.astype(int), rec[f"sd{i}.face_nodes"])
        np.testing.assert_allclose(sd.nodes, rec[f"sd{i}.nodes"])
        np.testing.assert_array_equal(
            sd.tags["fracture_faces"], rec[f"sd{i}.frac"]
        )
        np.testing.assert_array_equal(sd.tags["tip_faces"], rec[f"sd{i}.tip"])

    oi = mdg.interfaces()
    assert len(oi) == int(rec["n_intf"][0])
    for i, intf in enumerate(oi):
        assert intf.num_cells == int(rec[f"i{i}.cells"][0])
        for proj in _PROJS:
            assert_sparse_equal(getattr(intf, proj)(), rec[f"i{i}.{proj}"])


def test_cart_grid_3d_triple_crossing_topology(golden):
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

    def compute(ref_pp):
        mdg_ref = ref_pp.meshing.cart_grid(fracs, np.array([4, 4, 4]))
        out = {
            "counts": np.array(
                [mdg_ref.num_subdomains(), mdg_ref.num_interfaces()]
            )
        }
        for dim in range(4):
            refs = mdg_ref.subdomains(dim=dim)
            out[f"dim{dim}"] = np.array(
                [
                    len(refs),
                    sum(g.num_cells for g in refs),
                    sum(g.num_faces for g in refs),
                ]
            )
        return out

    rec = golden(compute)
    assert mdg.num_subdomains() == int(rec["counts"][0])
    assert mdg.num_interfaces() == int(rec["counts"][1])
    for dim in range(4):
        ours = mdg.subdomains(dim=dim)
        assert np.array_equal(
            np.array(
                [
                    len(ours),
                    sum(g.num_cells for g in ours),
                    sum(g.num_faces for g in ours),
                ]
            ),
            rec[f"dim{dim}"],
        )


def test_tensor_grid_with_fracture():
    f = np.array([[1.0, 3.0], [2.0, 2.0]])
    x = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    y = np.array([0.0, 1.0, 2.0, 3.0])
    mdg = meshing.tensor_grid([f], x, y)
    assert mdg.num_subdomains() == 2
    assert mdg.num_interfaces() == 1
    sd1 = mdg.subdomains(dim=1)[0]
    assert sd1.num_cells == 2
