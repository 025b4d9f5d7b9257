"""Model + params builders for the BASELINE.md benchmark configs.

``build_case(name)`` returns ``(model, params)`` with data saving
suppressed — ready for ``pt.run_time_dependent_model`` (the pull-capable
path) or the no-pull fused-block timer
(:mod:`porepy_tpu.applications.benchmarking.nopull`).

Configs (see BASELINE.md / tools/ref_baselines.json):
  - ``3d``:       compressible single-phase flow, 3d cartesian 32^3.
  - ``md``/``md256``: Mpfa single-phase md flow, 2d, 6 crossing
    fractures, mortar coupling, 0d intersections (1/128 and 1/256).
  - ``biot``:     Biot poromechanics, 2d 1/64.
  - ``tracer``:   tracer transport with in-kernel upwinding.
  - ``thm``:      thermoporomechanics + frictional contact, 3d, four
    fractures (reference: 54.7 s per Newton iteration).
  - ``berre3d``:  Berre et al. 3d benchmark case 2 md flow on the
    native fracture-conforming tet mesh (reference: 98.3 s/iter).
"""

from __future__ import annotations

import numpy as np

FRACTURES_2D = [
    np.array([[0.125, 0.875], [0.25, 0.25]]),
    np.array([[0.125, 0.875], [0.5, 0.5]]),
    np.array([[0.125, 0.875], [0.75, 0.75]]),
    np.array([[0.25, 0.25], [0.125, 0.875]]),
    np.array([[0.5, 0.5], [0.125, 0.875]]),
    np.array([[0.75, 0.75], [0.125, 0.875]]),
]


def _mat_flow():
    import porepy_tpu as pt

    return {
        "solid": pt.SolidConstants(
            permeability=1.0,
            porosity=0.1,
            residual_aperture=0.01,
            normal_permeability=1.0,
        ),
        "fluid": pt.FluidComponent(
            compressibility=1e-6, viscosity=1e-3, density=1000.0
        ),
    }


def _nosave(base):
    class NoSave(base):
        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    return NoSave


def build_md_flow(cell_size: float = 1.0 / 128):
    import porepy_tpu as pt

    class Model(_nosave(pt.SinglePhaseFlow)):
        def set_fractures(self):
            self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": _mat_flow(),
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    return Model, params


def build_3d_flow():
    import porepy_tpu as pt

    class Model(_nosave(pt.SinglePhaseFlow)):
        def set_domain(self):
            self._domain = pt.Domain(
                {"xmin": 0.0, "xmax": 1.0, "ymin": 0.0, "ymax": 1.0,
                 "zmin": 0.0, "zmax": 1.0}
            )

        def set_fractures(self):
            self._fractures = []

        def bc_type_darcy_flux(self, sd):
            return pt.BoundaryCondition(
                sd, self.domain_boundary_sides(sd).all_bf, "dir"
            )

        def bc_values_pressure(self, bg):
            return 1.0e5 + 1.0e4 * (1.0 - bg.cell_centers[0])

        def ic_values_pressure(self, sd):
            return np.full(sd.num_cells, 2.0e5)

        def initial_condition(self):
            super().initial_condition()
            for sd in self.mdg.subdomains():
                self.equation_system.set_variable_values(
                    self.ic_values_pressure(sd),
                    ["pressure"],
                    time_step_index=0,
                    iterate_index=0,
                )

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 32},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    return Model, params


def build_biot():
    import porepy_tpu as pt

    class Model(_nosave(pt.Poromechanics)):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 64},
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                permeability=1e-2,
                porosity=0.1,
                biot_coefficient=0.8,
                specific_storage=0.1,
            ),
            "fluid": pt.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=1e-2
            ),
        },
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    return Model, params


def build_tracer():
    import porepy_tpu as pt
    from porepy_tpu.examples.tracer_flow import TracerFlowModel

    Model = _nosave(TracerFlowModel)
    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                porosity=0.1, permeability=1e-7, normal_permeability=1e-7,
                residual_aperture=1e-2,
            ),
        },
        "fracture_indices": [0, 1],
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 64},
        "time_manager": pt.TimeManager([0, 26 * 60.0], 60.0, constant_dt=True),
        "max_iterations": 30,
        "nl_convergence_tol": 1e-8,
        "nl_convergence_tol_res": 1e-8,
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    return Model, params


def build_thm_contact_3d():
    import porepy_tpu as pt

    class Model(_nosave(pt.Thermoporomechanics)):
        def set_domain(self):
            self._domain = pt.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )

        def set_fractures(self):
            f = []
            for z in (0.25, 0.5, 0.75):
                f.append(np.array(
                    [[0.25, 0.75, 0.75, 0.25], [0.25, 0.25, 0.75, 0.75],
                     [z, z, z, z]]
                ))
            f.append(np.array(
                [[0.5, 0.5, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75],
                 [0.25, 0.75, 0.75, 0.25]]
            ))
            self._fractures = f

        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[0, north] = 0.01
            vals[1, north] = -0.005
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return 1e-3 * (1.0 - bg.cell_centers[1])

        def bc_values_temperature(self, bg):
            return 1.0 + 0.1 * bg.cell_centers[0]

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 16},
        "material_constants": {
            "solid": pt.SolidConstants(
                residual_aperture=0.01,
                normal_permeability=1.0,
                permeability=1.0,
                porosity=0.1,
                thermal_expansion=1e-4,
                thermal_conductivity=1.0,
                specific_heat_capacity=1.0,
                biot_coefficient=0.8,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-3,
                viscosity=1.0,
                density=1.0,
                thermal_conductivity=0.5,
                specific_heat_capacity=1.0,
                thermal_expansion=2e-4,
            ),
        },
        "time_manager": pt.TimeManager([0, 10.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        # chunk 2: one thm step is ~400 s on the single-core CPU twin, so
        # a 4-step block cannot fit any sane measurement deadline.
        "fused_time_steps": 2,
        "fused_commit_states": "tail",
        # Dense frozen block inverses (the TPU default) are REQUIRED here:
        # the semismooth contact block lands in the trailing Chebyshev
        # slot of the field split, where the smoother does not contract —
        # measured 560 stagnant Krylov iterations (|r| 4.2 from |b| 5.5,
        # host-spsolve fallback) without dense vs 56 iterations to 1.3e-8
        # with. Forcing it on keeps the CPU twin's preconditioner (hence
        # iteration counts) structurally identical to the TPU child's.
        "dense_precond": True,
    }
    return Model, params


def build_berre3d():
    import porepy_tpu as pt
    from porepy_tpu.applications.md_grids.mdg_library import (
        benchmark_3d_case_2,
    )

    mdg, _network = benchmark_3d_case_2(refinement_level=0)

    class Model(_nosave(pt.SinglePhaseFlow)):
        def set_geometry(self):
            self.mdg = mdg
            self.nd = 3
            self._domain = pt.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )
            self.set_well_network()

        def bc_values_pressure(self, bg):
            return 1.0e5 + 1.0e4 * (1.0 - bg.cell_centers[0])

    params = {
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=1e-2,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 10.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 4,
        "fused_commit_states": "tail",
    }
    return Model, params


CASE_BUILDERS = {
    "3d": build_3d_flow,
    "md": build_md_flow,
    "md256": lambda: build_md_flow(1.0 / 256),
    "biot": build_biot,
    "tracer": build_tracer,
    "thm": build_thm_contact_3d,
    "berre3d": build_berre3d,
}


def build_case(name: str):
    """Instantiate the case's model: ``(model, params)``."""
    cls, params = CASE_BUILDERS[name]()
    return cls(params), params
