"""Fracture propagation: extending a fracture through host faces must
reproduce the mdg that direct meshing of the longer fracture gives
(reference ``numerics/fracture_deformation/propagate_fracture.py``)."""

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.fracs import meshing
from porepy_tpu.numerics.fracture_deformation import propagate_fractures


def _mdg(frac):
    return meshing.cart_grid([np.array(frac)], np.array([4, 4]), physdims=[1.0, 1.0])


def _face_at(sd, center):
    d = np.linalg.norm(sd.face_centers[:2] - np.asarray(center)[:, None], axis=0)
    return int(d.argmin())


def test_propagation_matches_direct_meshing():
    mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
    sd_h = mdg.subdomains(dim=2)[0]
    sd_l = mdg.subdomains(dim=1)[0]

    # Extend through the next host face (x in [0.5, 0.75], y = 0.5).
    f = _face_at(sd_h, [0.625, 0.5])
    propagate_fractures(mdg, {sd_l: np.array([f])})
    mdg.compute_geometry()

    direct = _mdg([[0.25, 0.75], [0.5, 0.5]])
    dh = direct.subdomains(dim=2)[0]
    dl = direct.subdomains(dim=1)[0]

    assert sd_l.num_cells == dl.num_cells == 2
    assert sd_h.num_faces == dh.num_faces
    assert sd_h.num_nodes == dh.num_nodes
    assert np.isclose(sd_l.cell_volumes.sum(), dl.cell_volumes.sum())
    intf = list(mdg.interfaces())[0]
    dintf = list(direct.interfaces())[0]
    assert intf.num_cells == dintf.num_cells
    assert intf.num_sides() == dintf.num_sides()

    # Bookkeeping tags for partial rediscretization.
    data_h = mdg.subdomain_data(sd_h)
    assert data_h["split_faces"].size == 1
    assert data_h["new_faces"].size == 1
    assert mdg.subdomain_data(sd_l)["new_cells"].tolist() == [1]


def test_propagated_mdg_solves_flow_like_direct():
    mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
    sd_l = mdg.subdomains(dim=1)[0]
    sd_h = mdg.subdomains(dim=2)[0]
    f = _face_at(sd_h, [0.625, 0.5])
    propagate_fractures(mdg, {sd_l: np.array([f])})
    mdg.compute_geometry()

    direct = _mdg([[0.25, 0.75], [0.5, 0.5]])

    def run(grid):
        class M(pt.SinglePhaseFlow):
            def set_geometry(self):
                self.mdg = grid
                self.nd = 2
                self._domain = pt.Domain(
                    {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}
                )
                self.set_well_network()

            def set_well_network(self):
                self.well_network = None

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
                    residual_aperture=0.01,
                    normal_permeability=1.0,
                )
            },
        }
        m = M(params)
        pt.run_time_dependent_model(m, params)
        sd2 = grid.subdomains(dim=2)[0]
        p = m.equation_system.get_variable_values(
            [m.pressure([sd2])], time_step_index=0
        )
        order = np.lexsort(sd2.cell_centers[:2])
        return p[order]

    p_prop = run(mdg)
    p_direct = run(direct)
    assert np.allclose(p_prop, p_direct, atol=1e-10)


def test_state_rings_are_remapped():
    mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
    sd_l = mdg.subdomains(dim=1)[0]
    sd_h = mdg.subdomains(dim=2)[0]
    intf = list(mdg.interfaces())[0]
    from porepy_tpu.utils.solution_storage import (
        get_solution_values,
        set_solution_values,
    )

    set_solution_values(
        "pressure", np.array([7.0]), mdg.subdomain_data(sd_l),
        time_step_index=0, iterate_index=0,
    )
    lam = np.arange(intf.num_cells, dtype=float) + 1.0
    set_solution_values(
        "flux", lam, mdg.interface_data(intf),
        time_step_index=0, iterate_index=0,
    )
    n_sides = intf.num_sides()
    per_side = intf.num_cells // n_sides

    f = _face_at(sd_h, [0.625, 0.5])
    propagate_fractures(mdg, {sd_l: np.array([f])})

    p = get_solution_values("pressure", mdg.subdomain_data(sd_l), iterate_index=0)
    assert p.tolist() == [7.0, 0.0]
    lam_new = get_solution_values("flux", mdg.interface_data(intf), iterate_index=0)
    assert lam_new.size == intf.num_cells
    per_new = intf.num_cells // intf.num_sides()
    for s in range(n_sides):
        old_side = lam[s * per_side : (s + 1) * per_side]
        assert np.allclose(
            lam_new[s * per_new : s * per_new + per_side], old_side
        )


def test_propagation_model_mixin():
    """A flow model with scheduled propagation grows its fracture after the
    first step and keeps solving on the new topology (reference
    ``numerics/fracture_deformation/propagation_model.py``)."""
    from porepy_tpu.numerics.fracture_deformation import FracturePropagation

    class Grower(FracturePropagation, pt.SinglePhaseFlow):
        def set_geometry(self):
            self.mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
            self.nd = 2
            self._domain = pt.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1}
            )
            self.well_network = None

        def set_well_network(self):
            self.well_network = None

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def propagation_faces(self):
            sd_l = self.mdg.subdomains(dim=1)[0]
            sd_h = self.mdg.subdomains(dim=2)[0]
            if sd_l.num_cells >= 2 or self.time_manager.time < 1.0:
                return {sd_l: np.empty(0, dtype=int)}
            return {sd_l: np.array([_face_at(sd_h, [0.625, 0.5])])}

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            )
        },
        "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
    }
    m = Grower(params)
    pt.run_time_dependent_model(m, params)
    assert m.mdg.subdomains(dim=1)[0].num_cells == 2
    assert m.has_propagated() in (True, False)
    ndof = m.equation_system.num_dofs()
    p = m.equation_system.get_variable_values(time_step_index=0)
    assert p.size == ndof
    assert np.all(np.isfinite(p))


class _TensionPropagation(pt.ConformingFracturePropagation, pt.MomentumBalance):
    """Horizontal fracture in a plate pulled vertically apart: pure mode I
    at both tips."""

    def __init__(self, params, mdg):
        self._injected_mdg = mdg
        super().__init__(params)

    def set_geometry(self):
        from porepy_tpu.utils.tangential_normal_projection import (
            set_local_coordinate_projections,
        )

        self.mdg = self._injected_mdg
        self.nd = 2
        self._domain = pt.Domain({"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1})
        set_local_coordinate_projections(self.mdg)
        self.set_well_network()

    def set_well_network(self):
        self.well_network = None

    def bc_type_mechanics(self, sd):
        sides = self.domain_boundary_sides(sd)
        bc = pt.BoundaryConditionVectorial(
            sd, sides.north | sides.south, "dir"
        )
        bc.internal_to_dirichlet(sd)
        return bc

    def bc_values_displacement(self, bg):
        sides = self.domain_boundary_sides(bg)
        vals = np.zeros((self.nd, bg.num_cells))
        vals[1, sides.north] = 0.01
        vals[1, sides.south] = -0.01
        return vals.ravel("F")

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass


@pytest.mark.parametrize("critical,expect_growth", [(1e-4, True), (1e4, False)])
def test_conforming_propagation_tension(critical, expect_growth):
    mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
    n_cells_before = mdg.subdomains(dim=1)[0].num_cells
    params = {
        "critical_sifs": [critical, critical],
        "times_to_export": [],
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0, lame_lambda=1.0, residual_aperture=1e-3
            ),
        },
    }
    m = _TensionPropagation(params, mdg)
    pt.run_time_dependent_model(m, params)
    sd_l = m.mdg.subdomains(dim=1)[0]
    sifs = m.mdg.subdomain_data(sd_l).get("SIFs")
    assert sifs is not None
    # Mode-I SIFs at the two tips are positive (fracture opens).
    assert sifs[0].max() > 0
    if expect_growth:
        assert m.has_propagated()
        assert sd_l.num_cells > n_cells_before
    else:
        assert not m.has_propagated()
        assert sd_l.num_cells == n_cells_before


# -- 3d host grids -------------------------------------------------------------


def _mdg_3d(xmax):
    frac = np.array(
        [[0.25, xmax, xmax, 0.25],
         [0.25, 0.25, 0.75, 0.75],
         [0.5, 0.5, 0.5, 0.5]]
    )
    return meshing.cart_grid(
        [frac], np.array([4, 4, 4]), physdims=[1.0, 1.0, 1.0]
    )


def _faces_at(sd, centers):
    return np.array(
        [
            int(
                np.linalg.norm(
                    sd.face_centers - np.asarray(c)[:, None], axis=0
                ).argmin()
            )
            for c in centers
        ]
    )


def test_propagation_3d_matches_direct_meshing():
    """Advancing a plane fracture one host-face ring reproduces the grid
    that direct meshing of the larger fracture gives."""
    mdg = _mdg_3d(0.5)
    sd_h = mdg.subdomains(dim=3)[0]
    sd_l = mdg.subdomains(dim=2)[0]
    faces = _faces_at(sd_h, [[0.625, 0.375, 0.5], [0.625, 0.625, 0.5]])
    propagate_fractures(mdg, {sd_l: faces})
    mdg.compute_geometry()

    direct = _mdg_3d(0.75)
    dh = direct.subdomains(dim=3)[0]
    dl = direct.subdomains(dim=2)[0]
    assert sd_l.num_cells == dl.num_cells == 4
    assert sd_h.num_faces == dh.num_faces
    assert sd_h.num_nodes == dh.num_nodes
    assert np.isclose(sd_l.cell_volumes.sum(), dl.cell_volumes.sum())
    intf = list(mdg.interfaces())[0]
    dintf = list(direct.interfaces())[0]
    assert intf.num_cells == dintf.num_cells
    assert intf.num_sides() == dintf.num_sides()
    assert int(sd_l.tags["tip_faces"].sum()) == int(dl.tags["tip_faces"].sum())


def test_propagated_3d_mdg_solves_flow_like_direct():
    mdg = _mdg_3d(0.5)
    sd_h = mdg.subdomains(dim=3)[0]
    sd_l = mdg.subdomains(dim=2)[0]
    faces = _faces_at(sd_h, [[0.625, 0.375, 0.5], [0.625, 0.625, 0.5]])
    propagate_fractures(mdg, {sd_l: faces})
    mdg.compute_geometry()
    direct = _mdg_3d(0.75)

    def solve(grid_bundle):
        class Model(pt.SinglePhaseFlow):
            def set_geometry(self):
                self.mdg = grid_bundle
                self.nd = 3
                from porepy_tpu.geometry.domain import Domain

                self._domain = Domain(
                    {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                     "zmin": 0, "zmax": 1}
                )
                self.set_well_network()

            def bc_values_pressure(self, bg):
                return 1.0 - bg.cell_centers[0]

        params = {
            "material_constants": {
                "solid": pt.SolidConstants(
                    permeability=1.0, porosity=0.1,
                    residual_aperture=0.01, normal_permeability=1.0,
                ),
            },
            "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
            "linear_solver": "scipy_sparse",
        }
        m = Model(params)
        pt.run_time_dependent_model(m, params)
        return m

    m1, m2 = solve(mdg), solve(direct)
    p1 = m1.equation_system.get_variable_values(["pressure"], time_step_index=0)
    p2 = m2.equation_system.get_variable_values(["pressure"], time_step_index=0)
    # Same physical problem on identical (up to renumbering) grids: compare
    # sorted fields and total fracture pressure mass.
    assert p1.size == p2.size
    assert np.allclose(np.sort(p1), np.sort(p2), atol=1e-10)


def test_propagation_partial_rediscretization_matches_full():
    """After propagation, the partially updated host discretization equals
    a from-scratch discretization of the post-propagation grid (the model
    routes the host grid through ``update_discretization``)."""
    mdg = _mdg([[0.25, 0.5], [0.5, 0.5]])
    params = {
        "critical_sifs": [1e-4, 1e-4],
        "times_to_export": [],
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0, lame_lambda=1.0, residual_aperture=1e-3
            ),
        },
    }
    m = _TensionPropagation(params, mdg)
    pt.run_time_dependent_model(m, params)
    assert m.has_propagated()
    sd = m.mdg.subdomains(dim=2)[0]
    data = m.mdg.subdomain_data(sd)
    partial = {
        k: v.copy()
        for k, v in data[pt.DISCRETIZATION_MATRICES]["mechanics"].items()
    }
    # From-scratch reference on the same (already propagated) grid.
    d2 = pt.initialize_data(
        {},
        "mechanics",
        {
            "bc": m.bc_type_mechanics(sd),
            "fourth_order_tensor": m.stiffness_tensor(sd),
        },
    )
    pt.Mpsa("mechanics").discretize(sd, d2)
    for key, full in d2[pt.DISCRETIZATION_MATRICES]["mechanics"].items():
        diff = abs(partial[key] - full)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12, key
