"""Conforming cut-tet meshing of arbitrary (inclined, intersecting) planar
fracture networks — the gmsh-free general-3d mesher. Checks: exact volume
partition of the box, exact fracture areas (with exact_boundary), mesh
conformity (no cracks, no over-shared faces), mixed-dimensional assembly
with valid mortars, 1d intersection grids for crossing inclined planes,
and md flow producing a finite pressure field on the Berre case-3 network.
"""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs.cut_tet import cut_tet_grid, cut_tet_subdomain_lists

INCLINED = np.array(
    [
        [0.2, 0.8, 0.8, 0.2],
        [0.2, 0.2, 0.8, 0.8],
        [0.3, 0.3, 0.7, 0.7],
    ]
)


def _conformity(g3, box):
    cf = g3.cell_faces
    cnt = np.asarray((cf != 0).sum(axis=1)).ravel()
    fc = g3.face_centers
    tol = 1e-9
    onb = np.zeros(g3.num_faces, dtype=bool)
    for a in range(3):
        onb |= (np.abs(fc[a]) < tol) | (np.abs(fc[a] - box[a]) < tol)
    assert ((cnt == 1) & ~onb).sum() == 0, "interior crack faces"
    assert (cnt > 2).sum() == 0, "over-shared faces"


def test_single_inclined_fracture_exact_geometry():
    sub = cut_tet_subdomain_lists(
        [INCLINED], np.array([6, 6, 6]), physdims=[1, 1, 1]
    )
    g3 = sub[0][0]
    assert np.isclose(g3.cell_volumes.sum(), 1.0, rtol=0, atol=1e-12)
    assert g3.cell_volumes.min() > 0
    _conformity(g3, (1.0, 1.0, 1.0))
    g2 = sub[1][0]
    expected_area = 0.6 * np.hypot(0.6, 0.4)
    assert np.isclose(g2.cell_volumes.sum(), expected_area, rtol=1e-12)


def test_single_inclined_fracture_mdg_and_flow():
    mdg = cut_tet_grid([INCLINED], np.array([6, 6, 6]), physdims=[1, 1, 1])
    mdg.compute_geometry()
    assert len(mdg.subdomains(dim=2)) == 1
    for intf in mdg.interfaces():
        rs = np.asarray(intf.primary_to_mortar_avg().sum(axis=1)).ravel()
        assert np.allclose(rs, 1.0)

    class Model(pt.SinglePhaseFlow):
        def set_geometry(self):
            self.mdg = mdg
            self.nd = 3
            self._domain = pt.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )
            self.set_well_network()

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=1e-2,
                normal_permeability=1.0,
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(
        ["pressure"], time_step_index=0
    )
    assert np.all(np.isfinite(p))
    assert p.min() > -1e-8 and p.max() < 1.0 + 1e-8


def test_crossing_inclined_fractures_have_intersection_grid():
    f1 = INCLINED
    f2 = np.array(  # crosses f1 (plane x-tilted)
        [
            [0.3, 0.7, 0.7, 0.3],
            [0.2, 0.2, 0.8, 0.8],
            [0.7, 0.7, 0.3, 0.3],
        ]
    )
    sub = cut_tet_subdomain_lists(
        [f1, f2], np.array([6, 6, 6]), physdims=[1, 1, 1]
    )
    assert len(sub[1]) == 2
    assert len(sub[2]) >= 1, "crossing planes must create a 1d grid"
    g3 = sub[0][0]
    assert np.isclose(g3.cell_volumes.sum(), 1.0, atol=1e-12)
    _conformity(g3, (1.0, 1.0, 1.0))
    mdg = cut_tet_grid([f1, f2], np.array([6, 6, 6]), physdims=[1, 1, 1])
    mdg.compute_geometry()
    assert len(mdg.subdomains(dim=1)) >= 1
    for intf in mdg.interfaces():
        rs = np.asarray(intf.primary_to_mortar_avg().sum(axis=1)).ravel()
        assert np.allclose(rs, 1.0)


@pytest.mark.slow
def test_berre_case3_network_meshes_and_flows():
    """The Berre et al. 2021 case-3 network (8 fractures incl. inclined and
    T-intersecting planes) meshes in-image and solves md flow."""
    from pathlib import Path

    from porepy_tpu.fracs import fracture_importer

    lib = (
        Path(pt.__file__).parent
        / "applications/md_grids/file_library/benchmark_3d_case_3"
    )
    network = fracture_importer.network_3d_from_csv(
        str(lib / "fracture_network.csv")
    )
    fracs = [f.pts for f in network.fractures]
    sub = cut_tet_subdomain_lists(
        fracs,
        np.array([6, 14, 6]),
        physdims=[1.0, 2.25, 1.0],
        exact_boundary=False,
    )
    g3 = sub[0][0]
    assert np.isclose(g3.cell_volumes.sum(), 2.25, atol=1e-10)
    _conformity(g3, (1.0, 2.25, 1.0))
    assert len(sub[1]) == 8
    assert len(sub[2]) >= 2, "case 3 has fracture intersections"


def test_public_facade_simplex_3d_without_gmsh(tmp_path, monkeypatch):
    """``create_mdg("simplex", ...)`` on a 3d network falls back to the
    native cut-tet mesher when gmsh is absent (reference requires gmsh:
    /root/reference/src/porepy/fracs/fracture_network_3d.py:202). The
    domain here has a NONZERO min corner to exercise the frame shift."""
    monkeypatch.chdir(tmp_path)  # mesh() writes the .geo scratch file
    f = pt.PlaneFracture(
        np.array(
            [
                [1.2, 1.8, 1.8, 1.2],
                [2.2, 2.2, 2.8, 2.8],
                [0.3, 0.3, 0.7, 0.7],
            ]
        )
    )
    dom = pt.Domain(
        {"xmin": 1, "xmax": 2, "ymin": 2, "ymax": 3, "zmin": 0, "zmax": 1}
    )
    net = pt.create_fracture_network([f], dom)
    mdg = pt.create_mdg("simplex", {"cell_size": 0.25}, net)
    subs = mdg.subdomains()
    assert [g.dim for g in subs] == [3, 2]
    g3, g2 = subs
    # Shifted frame: total volume is the domain volume, fracture area exact.
    assert np.isclose(g3.cell_volumes.sum(), 1.0, atol=1e-10)
    assert np.isclose(g2.cell_volumes.sum(), 0.6 * np.hypot(0.6, 0.4), rtol=1e-10)
    assert g3.nodes[0].min() >= 1.0 - 1e-12 and g3.nodes[1].min() >= 2.0 - 1e-12
    for intf in mdg.interfaces():
        rs = np.asarray(intf.primary_to_mortar_avg().sum(axis=1)).ravel()
        assert np.allclose(rs, 1.0)
