"""Compositional transport parity vs the REFERENCE framework: both tracer
models (single-phase, two-component flow through the component-mass-balance
machinery) run on the same cartesian grid with the same parameters; the
tracer fraction fields must agree."""

import numpy as np
import pytest

import porepy_tpu as pt


def _params(mod):
    return {
        "material_constants": {
            "solid": mod.SolidConstants(
                porosity=0.1, permeability=1e-7, normal_permeability=1e-19
            ),
        },
        "fracture_indices": [0],
        "time_manager": mod.TimeManager(
            schedule=[0, 5e-4], dt_init=2.5e-4, constant_dt=True
        ),
        "meshing_arguments": {"cell_size": 0.25},
        "grid_type": "cartesian",
        "max_iterations": 60,
        "nl_convergence_tol": 1e-10,
        "nl_convergence_tol_res": 1e-10,
        "times_to_export": [],
        "suppress_export": True,
    }


def test_tracer_flow_matches_reference(golden):
    # Our model.
    from porepy_tpu.examples.tracer_flow import TracerFlowModel

    params = _params(pt)
    ours = TracerFlowModel(params)
    pt.run_time_dependent_model(ours, params)
    z_ours = ours.equation_system.get_variable_values(
        ["z_tracer"], time_step_index=0
    )
    p_ours = ours.equation_system.get_variable_values(
        ["pressure"], time_step_index=0
    )

    def compute(ref_pp):
        # Reference model (same composition as reference examples/tracer_flow.py).
        from porepy.applications.boundary_conditions.model_boundary_conditions import (
            BoundaryConditionsMassDirNorthSouth,
        )
        from porepy.applications.material_values.fluid_values import water
        from porepy.applications.md_grids.model_geometries import (
            SquareDomainOrthogonalFractures,
        )
        from porepy.compositional.compositional_mixins import CompositionalVariables
        from porepy.models.compositional_flow import (
            BoundaryConditionsMulticomponent,
            ComponentMassBalanceEquations,
            InitialConditionsFractions,
        )

        class RefTracerFluid:
            def get_components(self):
                return [
                    ref_pp.FluidComponent(**water),
                    ref_pp.FluidComponent(name="tracer"),
                ]

        class RefIC(InitialConditionsFractions):
            def ic_values_pressure(self, sd):
                return np.ones(sd.num_cells) * self.units.convert_units(1e6, "Pa")

            def ic_values_overall_fraction(self, component, sd):
                return np.zeros(sd.num_cells)

        class RefBC(BoundaryConditionsMassDirNorthSouth, BoundaryConditionsMulticomponent):
            def bc_values_pressure(self, bg):
                sides = self.domain_boundary_sides(bg)
                values = np.ones(bg.num_cells) * self.units.convert_units(1e6, "Pa")
                values[sides.north] = self.units.convert_units(1.5e6, "Pa")
                return values

            def bc_values_overall_fraction(self, component, bg):
                z = np.zeros(bg.num_cells)
                if component.name == "tracer":
                    sides = self.domain_boundary_sides(bg)
                    z[sides.north] = 0.1 + 0.1 * (
                        bg.cell_centers[0, sides.north] > 0.5
                    )
                return z

        class RefTracer(
            SquareDomainOrthogonalFractures,
            RefTracerFluid,
            CompositionalVariables,
            ComponentMassBalanceEquations,
            RefBC,
            RefIC,
            ref_pp.SinglePhaseFlow,
        ):
            pass

        ref_params = _params(ref_pp)
        theirs = RefTracer(ref_params)
        ref_pp.run_time_dependent_model(theirs)
        z_ref = theirs.equation_system.get_variable_values(
            ["z_tracer"], time_step_index=0
        )
        p_ref = theirs.equation_system.get_variable_values(
            ["pressure"], time_step_index=0
        )


        return {"z_tracer": z_ref, "pressure": p_ref}

    ref_vals = golden(compute)
    z_ref = np.asarray(ref_vals["z_tracer"])
    p_ref = np.asarray(ref_vals["pressure"])

    assert z_ours.shape == z_ref.shape
    assert np.allclose(p_ours, p_ref, rtol=1e-8, atol=1e-4)
    assert np.allclose(z_ours, z_ref, rtol=1e-6, atol=1e-10), (
        np.abs(z_ours - z_ref).max()
    )
