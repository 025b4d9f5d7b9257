"""Applications layer: canned grids/geometries/BCs, material values and
the convergence-analysis harness."""

from dataclasses import dataclass

import numpy as np
import pytest

import porepy_tpu as pt
from porepy_tpu.applications.boundary_conditions.model_boundary_conditions import (
    BoundaryConditionsMassDirNorthSouth,
)
from porepy_tpu.applications.convergence_analysis import ConvergenceAnalysis
from porepy_tpu.applications.material_values import (
    fluid_values,
    solid_values,
)
from porepy_tpu.applications.md_grids import mdg_library
from porepy_tpu.applications.md_grids.model_geometries import (
    SquareDomainOrthogonalFractures,
)


def test_square_with_orthogonal_fractures():
    mdg, network = mdg_library.square_with_orthogonal_fractures(
        "cartesian", {"cell_size": 0.25}, [0, 1]
    )
    dims = sorted(sd.dim for sd in mdg.subdomains())
    assert dims == [0, 1, 1, 2]
    assert network.num_frac() == 2


def test_cube_with_orthogonal_fractures():
    mdg, _ = mdg_library.cube_with_orthogonal_fractures(
        "cartesian", {"cell_size": 0.5}, [0]
    )
    assert sorted(sd.dim for sd in mdg.subdomains()) == [2, 3]


def test_material_values_construct_constants():
    solid = pt.SolidConstants(**solid_values.granite)
    fluid = pt.FluidComponent(**fluid_values.water)
    assert solid.biot_coefficient == 0.47
    assert np.isclose(fluid.viscosity, 1.002e-3)


def test_model_geometry_and_bc_mixins():
    """A flow model composed from the canned geometry and BC mixins runs and
    produces the expected north-south pressure gradient."""

    class Model(
        SquareDomainOrthogonalFractures,
        BoundaryConditionsMassDirNorthSouth,
        pt.SinglePhaseFlow,
    ):
        pass

    params = {
        "fracture_indices": [1],
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            )
        },
        "suppress_export": True,
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    sd = m.mdg.subdomains(dim=2)[0]
    p = m.equation_system.get_variable_values(["pressure"], iterate_index=0)[
        : sd.num_cells
    ]
    south = sd.cell_centers[1] < 0.25
    north = sd.cell_centers[1] > 0.75
    assert p[south].mean() > p[north].mean()


@dataclass
class _Result:
    error_pressure: float = 0.0


class _Manufactured(pt.SinglePhaseFlow):
    def exact_pressure(self, sd):
        return np.sin(np.pi * sd.cell_centers[0]) * np.sin(
            np.pi * sd.cell_centers[1]
        )

    def fluid_source(self, subdomains):
        from porepy_tpu.numerics import ad

        if not subdomains or subdomains[0].dim != self.nd:
            return super().fluid_source(subdomains)
        vals = [
            2 * np.pi**2 * self.exact_pressure(sd) * sd.cell_volumes
            for sd in subdomains
        ]
        return ad.DenseArray(np.concatenate(vals), "source")

    def bc_values_pressure(self, bg):
        return np.zeros(bg.num_cells)

    def collect_data(self):
        sd = self.mdg.subdomains(dim=self.nd)[0]
        p = self.equation_system.get_variable_values(
            ["pressure"], iterate_index=0
        )
        err = ConvergenceAnalysis.l2_error(
            sd,
            self.exact_pressure(sd),
            p[: sd.num_cells],
            True,
            True,
            relative=True,
        )
        return _Result(error_pressure=err)


def test_convergence_analysis_second_order():
    params = {
        "meshing_arguments": {"cell_size": 0.25},
        "material_constants": {
            "solid": pt.SolidConstants(permeability=1.0, porosity=0.1),
            "fluid": pt.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=0.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "suppress_export": True,
    }
    ca = ConvergenceAnalysis(
        _Manufactured, params, levels=3, spatial_refinement_rate=2
    )
    results = ca.run_analysis()
    ooc = ca.order_of_convergence(results)
    assert 1.8 < ooc["ooc_pressure"] < 2.3
