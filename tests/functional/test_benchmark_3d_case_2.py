"""Berre et al. (2021) 3d flow benchmark, case 2, on the native
fracture-conforming structured-tet mesh: md single-phase flow parity with
the reference framework ON THE SAME SIMPLEX MESH (the reference's
``tests/functional/test_benchmark_3d_case_2.py`` checks the gmsh mesh; here
both frameworks consume identical tetrahedral subdomain grids, so fields
must agree to solver tolerance)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.md_grids.mdg_library import benchmark_3d_case_2


def test_native_case2_mesh_structure():
    mdg, network = benchmark_3d_case_2(refinement_level=0)
    assert len(network.fractures) == 9
    assert len(mdg.subdomains(dim=2)) == 9
    sd3 = mdg.subdomains(dim=3)[0]
    assert sd3.num_cells == 6 * 16**3
    assert np.isclose(sd3.cell_volumes.sum(), 1.0)
    # Every fracture grid couples to the matrix through a mortar interface.
    intfs = mdg.interfaces(codim=1)
    assert len(intfs) >= 9 + len(mdg.subdomains(dim=1))
    for intf in intfs:
        P = intf.primary_to_mortar_avg()
        assert np.allclose(np.asarray(P.sum(axis=1)).ravel(), 1.0)


def _case2_fractures():
    from porepy_tpu.fracs import fracture_importer
    from pathlib import Path

    lib = (
        Path(pt.__file__).parent
        / "applications/md_grids/file_library/benchmark_3d_case_2"
    )
    network = fracture_importer.network_3d_from_csv(
        str(lib / "fracture_network.csv")
    )
    return [f.pts for f in network.fractures]


def _mirror_subdomains_to_reference(ref_pp, subdomains):
    """Rebuild the pristine per-dim grid lists as reference grid objects
    (same nodes, same connectivity, same global point indices)."""
    out = []
    for dim, grids in zip((3, 2, 1, 0), subdomains):
        row = []
        for g in grids:
            if dim == 3:
                cn = g.cell_nodes().tocsc()
                rg = ref_pp.TetrahedralGrid(
                    g.nodes.copy(),
                    cn.indices.reshape((4, g.num_cells), order="F"),
                )
            elif dim == 2:
                cn = g.cell_nodes().tocsc()
                rg = ref_pp.TriangleGrid(
                    g.nodes.copy(),
                    cn.indices.reshape((3, g.num_cells), order="F"),
                )
                rg.frac_num = g.frac_num
            elif dim == 1:
                from porepy.fracs.msh_2_grid import (
                    create_embedded_line_grid,
                )

                # create_embedded_line_grid sorts the points along the
                # line and sets global_point_ind consistently — do NOT
                # overwrite it, or node ids and coordinates desynchronize.
                rg = create_embedded_line_grid(
                    g.nodes.copy(), np.asarray(g.global_point_ind)
                )
            else:
                rg = ref_pp.PointGrid(g.cell_centers[:, 0])
            if dim != 1:
                rg.global_point_ind = np.asarray(g.global_point_ind).copy()
            rg.compute_geometry()
            row.append(rg)
        out.append(row)
    return out


def _run_flow(pp_mod, mdg, make_model):
    class Model(make_model):
        def set_geometry(self):
            self.mdg = mdg
            self.nd = 3
            self._domain = pp_mod.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )
            if hasattr(self, "set_well_network"):
                self.set_well_network()

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[0]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "material_constants": {
            "solid": pp_mod.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=1e-2,
                normal_permeability=1.0,
            ),
        },
        "time_manager": pp_mod.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    m = Model(params)
    pp_mod.run_time_dependent_model(m, params)
    return m


def test_case2_flow_parity_same_mesh(golden):
    """Pressure fields agree with the reference on the identical tet mesh
    (cell matching by center coordinates; 1e-8 target per BASELINE). The
    reference fields are recorded as goldens, so the assertion holds on
    machines without a reference checkout."""
    from porepy_tpu.fracs import meshing
    from porepy_tpu.fracs.structured_simplex import tet_subdomain_lists

    fracs = _case2_fractures()
    sub = tet_subdomain_lists(fracs, np.array([8] * 3), physdims=[1, 1, 1])

    mdg = meshing.subdomains_to_mdg(sub)
    mdg.compute_geometry()
    m = _run_flow(pt, mdg, pt.SinglePhaseFlow)

    def compute(ref_pp):
        # Rebuild pristine subdomain lists: subdomains_to_mdg mutates the
        # grids above (face splitting), and the mirror needs them unsplit.
        sub2 = tet_subdomain_lists(
            fracs, np.array([8] * 3), physdims=[1, 1, 1]
        )
        sub_ref = _mirror_subdomains_to_reference(ref_pp, sub2)
        ref_mdg = ref_pp.meshing.subdomains_to_mdg(sub_ref)
        ref_mdg.compute_geometry()
        r = _run_flow(ref_pp, ref_mdg, ref_pp.SinglePhaseFlow)
        out = {}
        for dim in (3, 2, 1, 0):
            for i, g_ref in enumerate(ref_mdg.subdomains(dim=dim)):
                p_ref = r.equation_system.get_variable_values(
                    ["pressure"], time_step_index=0
                )[r.equation_system.dofs_of(
                    [v for v in r.equation_system.variables
                     if v.name == "pressure" and v.domain is g_ref]
                )]
                out[f"p_{dim}_{i}"] = p_ref
                out[f"cc_{dim}_{i}"] = g_ref.cell_centers
        return out

    ref = golden(compute)
    for dim in (3, 2, 1, 0):
        for i, g_mine in enumerate(mdg.subdomains(dim=dim)):
            p_mine = m.equation_system.get_variable_values(
                ["pressure"], time_step_index=0
            )[m.equation_system.dofs_of(
                [v for v in m.equation_system.variables
                 if v.name == "pressure" and v.domain is g_mine]
            )]
            p_ref = ref[f"p_{dim}_{i}"]
            # Match cells by center coordinates (orderings differ).
            key_m = np.round(g_mine.cell_centers, 10)
            key_r = np.round(ref[f"cc_{dim}_{i}"], 10)
            order_m = np.lexsort(key_m)
            order_r = np.lexsort(key_r)
            assert np.allclose(
                key_m[:, order_m], key_r[:, order_r], atol=1e-9
            ), (dim, "cell centers differ")
            err = np.abs(p_mine[order_m] - p_ref[order_r]).max()
            scale = max(np.abs(p_ref).max(), 1e-300)
            assert err / scale < 1e-8, (dim, err / scale)
