"""Native 2d simplex meshing (conforming constrained Delaunay): geometric
integrity, model integration, and REAL parity against the reference
framework on the identical triangulation (reference grids built from the
same point/connectivity arrays, reference mdg assembled with the
reference's own fracs.meshing.subdomains_to_mdg)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import simplex

DOM = {"xmin": 0.0, "xmax": 1.0, "ymin": 0.0, "ymax": 1.0}
FRAC_PTS = np.array([[0.2, 0.8, 0.5, 0.5], [0.5, 0.5, 0.2, 0.8]])
FRAC_EDGES = np.array([[0, 2], [1, 3]])


def test_cdt_geometric_integrity():
    subs = simplex.triangle_grid_fractured_2d(DOM, FRAC_PTS, FRAC_EDGES, 0.1)
    g2 = subs[0][0]
    assert g2.cell_volumes.min() > 0
    # Triangulation covers the domain exactly.
    assert abs(g2.cell_volumes.sum() - 1.0) < 1e-10
    # Two 1d fracture grids and one 0d intersection grid.
    assert len(subs[1]) == 2
    assert len(subs[2]) == 1
    # 1d grids trace the fracture segments.
    for fi, g1 in enumerate(subs[1]):
        seg = FRAC_PTS[:, FRAC_EDGES[:, fi]]
        lo, hi = seg.min(axis=1), seg.max(axis=1)
        assert np.all(g1.nodes[:2].min(axis=1) >= lo - 1e-10)
        assert np.all(g1.nodes[:2].max(axis=1) <= hi + 1e-10)
        g1.compute_geometry()
        length = np.linalg.norm(seg[:, 1] - seg[:, 0])
        assert abs(g1.cell_volumes.sum() - length) < 1e-10


def test_cdt_constraint_edges_are_faces():
    builder = simplex.ConformingTriangulation2d(
        DOM, FRAC_PTS, FRAC_EDGES, 0.1
    ).build()
    edges = set()
    for i, j in ((0, 1), (1, 2), (0, 2)):
        for a, b in zip(builder.simplices[:, i], builder.simplices[:, j]):
            edges.add((min(a, b), max(a, b)))
    for c in builder.chains + builder.boundary_chains:
        nodes = c["nodes"]
        for a, b in zip(nodes[:-1], nodes[1:]):
            assert (min(a, b), max(a, b)) in edges


def test_simplex_model_linear_pressure_exact():
    class Lin(pt.SinglePhaseFlow):
        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[0]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {"grid_type": "simplex", "meshing_arguments": {"cell_size": 0.2}}
    m = Lin(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(time_step_index=0)
    ex = 1.0 - m.mdg.subdomains()[0].cell_centers[0]
    assert np.linalg.norm(p - ex) / np.linalg.norm(ex) < 1e-10


def test_simplex_fractured_model_runs():
    class MD(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [
                pt.LineFracture(np.array([[0.2, 0.8], [0.5, 0.5]])),
                pt.LineFracture(np.array([[0.5, 0.5], [0.2, 0.8]])),
            ]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "simplex",
        "meshing_arguments": {"cell_size": 0.12},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
        },
    }
    m = MD(params)
    pt.run_time_dependent_model(m, params)
    p = m.equation_system.get_variable_values(["pressure"], time_step_index=0)
    assert p.min() > -1e-8 and p.max() < 1.0 + 1e-8


def _mirror_reference_mdg(ref_pp, subs):
    """Reference mdg from OUR simplex grids' raw arrays (same points,
    same connectivity, same global node indices)."""
    import porepy.fracs.meshing as ref_meshing
    import porepy.fracs.msh_2_grid as ref_msh

    g2 = subs[0][0]
    cn = g2.cell_nodes()
    tri = cn.indices.reshape((g2.num_cells, 3)).T if False else None
    # Recover (3, nc) connectivity in cell order from the CSC cell_nodes.
    tri = np.vstack(
        [cn.indices[cn.indptr[c] : cn.indptr[c + 1]] for c in range(g2.num_cells)]
    ).T
    rg2 = ref_pp.TriangleGrid(g2.nodes[:2].copy(), tri.copy())
    rg2.global_point_ind = np.arange(rg2.num_nodes)
    rg2.compute_geometry()

    rg1 = []
    for g1 in subs[1]:
        order = np.argsort(g1.global_point_ind)
        nodes = g1.global_point_ind[order]
        coords = np.vstack([g2.nodes[:2, nodes], np.zeros(nodes.size)])
        rg = ref_msh.create_embedded_line_grid(coords, nodes)
        rg.frac_num = g1.frac_num
        rg1.append(rg)

    rg0 = []
    for g0 in subs[2]:
        node = int(g0.global_point_ind[0])
        rg = ref_pp.PointGrid(np.hstack([g2.nodes[:2, node], 0.0]))
        rg.global_point_ind = np.atleast_1d(node)
        rg0.append(rg)

    return ref_meshing.subdomains_to_mdg([[rg2], rg1, rg0])


def test_simplex_md_flow_parity(golden):
    subs = simplex.triangle_grid_fractured_2d(DOM, FRAC_PTS, FRAC_EDGES, 0.15)
    from porepy_tpu.fracs import meshing as our_meshing

    solid = dict(
        permeability=1.0,
        porosity=0.1,
        residual_aperture=0.01,
        normal_permeability=1.0,
    )

    def run(mod, mdg, base):
        class M(base):
            def set_geometry(self):
                self.mdg = mdg
                self.nd = 2
                self._domain = mod.Domain(dict(DOM))
                mod.set_local_coordinate_projections(self.mdg) if hasattr(
                    mod, "set_local_coordinate_projections"
                ) else None
                self.set_well_network()

            def set_well_network(self):
                try:
                    super().set_well_network()
                except Exception:
                    self.well_network = None

            def bc_values_pressure(self, bg):
                return 1.0 - bg.cell_centers[1]

            def initialize_data_saving(self):
                pass

            def save_data_time_step(self):
                pass

        params = {
            "material_constants": {"solid": mod.SolidConstants(**solid)},
            "time_manager": mod.TimeManager([0, 1.0], 1.0, constant_dt=True),
        }
        m = M(params)
        mod.run_time_dependent_model(m, params)
        return m

    def compute(ref_pp):
        # Mirror BEFORE building our mdg: subdomains_to_mdg splits
        # faces/nodes of the grids in place, so the reference copy must be
        # taken from the pristine triangulation.
        ref_mdg = _mirror_reference_mdg(ref_pp, subs)
        theirs = run(ref_pp, ref_mdg, ref_pp.SinglePhaseFlow)
        return {
            "pressure": theirs.equation_system.get_variable_values(
                ["pressure"], time_step_index=0
            )
        }

    rec = golden(compute)
    our_mdg = our_meshing.subdomains_to_mdg(
        [
            [subs[0][0]],
            list(subs[1]),
            list(subs[2]),
        ]
    )
    ours = run(pt, our_mdg, pt.SinglePhaseFlow)
    p_ours = ours.equation_system.get_variable_values(
        ["pressure"], time_step_index=0
    )
    p_ref = np.asarray(rec["pressure"])
    assert p_ours.shape == p_ref.shape
    assert np.abs(p_ours - p_ref).max() < 1e-8
