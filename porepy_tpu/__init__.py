"""porepy_tpu: TPU-native framework for multiphysics in fractured and
deformable porous media.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PorePy framework (https://github.com/pmgbergen/porepy): mixed-dimensional
grids, finite-volume discretizations (TPFA/MPFA/MPSA/Biot/upwind), an
operator-based equation layer that compiles to jitted residual/Jacobian
evaluation with static sparsity, Newton solvers with device Krylov linear
algebra, and a mixin-composed model framework.

The flat namespace mirrors the reference's ``pp.`` API contract
(``/root/reference/src/porepy/__init__.py:46-249``); import as::

    import porepy_tpu as pp

Architecture: grid construction and meshing run host-side (numpy/scipy) at
setup; everything per Newton iteration is device-resident jax with static
shapes. Double precision is enabled globally (parity target is 1e-8 L2
against the reference); performance-critical paths may opt into f32/bf16.
"""

from __future__ import annotations

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Default device = host CPU: setup work (geometry, discretization, operator
# tracing) is latency-bound small-op orchestration the accelerator is bad
# at — catastrophically so through a tunneled TPU. The hot loop opts into
# the accelerator explicitly via utils.device_policy (see its docstring).
_jax.config.update("jax_default_device", "cpu")

# An explicit JAX_PLATFORMS that omits "cpu" (e.g. a bare accelerator-plugin
# name) would leave the host backend uninitializable; the split above
# requires it. Order is preserved, so the accelerator keeps priority.
_plat = _jax.config.jax_platforms
if _plat and "cpu" not in [p.strip() for p in _plat.split(",")]:
    _jax.config.update("jax_platforms", _plat + ",cpu")
del _plat

# Persistent XLA compilation cache. jax 0.9 no longer reads the
# JAX_COMPILATION_CACHE_DIR environment variable (only config/flags), so a
# set-but-ignored env var silently costs minutes of single-core recompiles
# per process. Honor it here; harmless when unset.
import os as _os

if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _jax.config.update(
        "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # 0.0, not the usual 1s floor: through the tunneled backend even
    # trivial programs (jit_negative, jit_concatenate, ...) take ~0.4 s to
    # compile, and a process runs dozens of them — refusing to cache
    # sub-second entries costs minutes per fresh process.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
del _os

__version__ = "0.1.0"

# -- constants & keys -----------------------------------------------------
from porepy_tpu.utils.common_constants import (  # noqa: E402,F401
    PARAMETERS,
    DISCRETIZATION_MATRICES,
    TIME_STEP_SOLUTIONS,
    ITERATE_SOLUTIONS,
    NANO,
    MICRO,
    MILLI,
    CENTI,
    DECI,
    KILO,
    MEGA,
    GIGA,
    DAY,
    HOUR,
    MINUTE,
    DARCY,
    MILLIDARCY,
    PASCAL,
    BAR,
    ATMOSPHERIC_PRESSURE,
    GRAVITY_ACCELERATION,
    CELSIUS,
    CELSIUS_to_KELVIN,
)

# -- geometry ---------------------------------------------------------------
from porepy_tpu.geometry import (  # noqa: E402,F401
    constrain_geometry,
    distances,
    half_space,
    intersections,
    map_geometry,
    point_in_polyhedron,
    sort_points,
)

# -- grids -------------------------------------------------------------------
from porepy_tpu.grids.grid import Grid  # noqa: E402,F401
from porepy_tpu.grids.structured import CartGrid, TensorGrid  # noqa: E402,F401
from porepy_tpu.grids.simplex import (  # noqa: E402,F401
    StructuredTetrahedralGrid,
    StructuredTriangleGrid,
    TetrahedralGrid,
    TriangleGrid,
)

# -- fractures -----------------------------------------------------------------
from porepy_tpu.fracs.fracture import (  # noqa: E402,F401
    LineFracture,
    PlaneFracture,
    create_elliptic_fracture,
)
from porepy_tpu.fracs.fracture_network import (  # noqa: E402,F401
    create_fracture_network,
)
from porepy_tpu.fracs.fracture_network_2d import FractureNetwork2d  # noqa: E402,F401
from porepy_tpu.fracs.fracture_network_3d import FractureNetwork3d  # noqa: E402,F401
from porepy_tpu.fracs import fracture_importer  # noqa: E402,F401
from porepy_tpu.fracs.wells_3d import (  # noqa: E402,F401
    Well,
    WellNetwork3d,
    compute_well_fracture_intersections,
    compute_well_rock_matrix_intersections,
)
from porepy_tpu.grids import match_grids  # noqa: E402,F401
from porepy_tpu.grids.mdg_generation import create_mdg  # noqa: E402,F401
from porepy_tpu.grids.point_grid import PointGrid  # noqa: E402,F401
from porepy_tpu.grids.boundary_grid import BoundaryGrid  # noqa: E402,F401
from porepy_tpu.grids.md_grid import MixedDimensionalGrid  # noqa: E402,F401

# -- parameters & materials --------------------------------------------------
from porepy_tpu.params.bc import (  # noqa: E402,F401
    BoundaryCondition,
    BoundaryConditionVectorial,
)
from porepy_tpu.params.tensor import (  # noqa: E402,F401
    SecondOrderTensor,
    FourthOrderTensor,
)
from porepy_tpu.params.data import initialize_data  # noqa: E402,F401

# -- discretizations ---------------------------------------------------------
from porepy_tpu.numerics.fv.tpfa import Tpfa  # noqa: E402,F401
from porepy_tpu.numerics.fv.fv_mesh import FvMesh, BoundaryMasks  # noqa: E402,F401

# -- AD / equation layer -----------------------------------------------------
from porepy_tpu.numerics import ad  # noqa: E402,F401
from porepy_tpu.utils.solution_storage import (  # noqa: E402,F401
    set_solution_values,
    get_solution_values,
    shift_solution_values,
)

# -- geometry / domain -------------------------------------------------------
from porepy_tpu.geometry.domain import Domain, DomainSides  # noqa: E402,F401

# -- discretizations (continued) ---------------------------------------------
from porepy_tpu.numerics.fv.upwind import Upwind  # noqa: E402,F401

# -- solvers / time stepping -------------------------------------------------
from porepy_tpu.numerics.fracture_deformation import (  # noqa: E402,F401
    propagate_fractures,
)
from porepy_tpu.numerics.fracture_deformation.conforming_propagation import (  # noqa: E402,F401
    ConformingFracturePropagation,
)
from porepy_tpu.numerics import displacement_correlation  # noqa: E402,F401
from porepy_tpu.numerics.nonlinear.nonlinear_solvers import (  # noqa: E402,F401
    NewtonSolver,
)
from porepy_tpu.numerics.linear_solvers import LinearSolver  # noqa: E402,F401
from porepy_tpu.numerics.nonlinear.line_search import (  # noqa: E402,F401
    ConstraintLineSearch,
    LineSearchNewtonSolver,
    SplineInterpolationLineSearch,
)
from porepy_tpu.numerics.nonlinear.anderson_acceleration import (  # noqa: E402,F401
    AndersonAcceleration,
)
from porepy_tpu.numerics.time_step_control import TimeManager  # noqa: E402,F401

# -- materials / units -------------------------------------------------------
from porepy_tpu.models.units import Units  # noqa: E402,F401
from porepy_tpu.compositional.materials import (  # noqa: E402,F401
    Constants,
    FluidComponent,
    SolidConstants,
    NumericalConstants,
    ReferenceVariableValues,
)
from porepy_tpu.compositional._core import PhysicalState  # noqa: E402,F401
from porepy_tpu.compositional.base import (  # noqa: E402,F401
    Component,
    Compound,
    EquationOfState,
    Fluid,
    Phase,
)
from porepy_tpu.compositional.compositional_mixins import (  # noqa: E402,F401
    CompositionalVariables,
    FluidMixin,
)
from porepy_tpu.compositional.flash import (  # noqa: E402,F401
    ConstantKFlash,
    Flash,
)
from porepy_tpu.compositional.states import FluidState, PhaseState  # noqa: E402,F401
from porepy_tpu.compositional import utils as composite_utils  # noqa: E402,F401

# -- model framework ---------------------------------------------------------
from porepy_tpu.models.geometry import ModelGeometry  # noqa: E402,F401
from porepy_tpu.models.protocol import PorePyModel  # noqa: E402,F401
from porepy_tpu.models.abstract_equations import (  # noqa: E402,F401
    BalanceEquation,
    LocalElimination,
    VariableMixin,
)
from porepy_tpu.models.boundary_condition import (  # noqa: E402,F401
    BoundaryConditionMixin,
)
from porepy_tpu.models.initial_condition import (  # noqa: E402,F401
    InitialConditionMixin,
)
from porepy_tpu.models.solution_strategy import (  # noqa: E402,F401
    ContactIndicators,
    SolutionStrategy,
)
from porepy_tpu.models import constitutive_laws  # noqa: E402,F401
from porepy_tpu.models.darcys_law_ad import (  # noqa: E402,F401
    AdTpfaFlux,
    DarcysLawAd,
    FouriersLawAd,
)
from porepy_tpu.models.fluid_mass_balance import SinglePhaseFlow  # noqa: E402,F401
from porepy_tpu.models.mass_and_energy_balance import (  # noqa: E402,F401
    MassAndEnergyBalance,
)
from porepy_tpu.models.momentum_balance import MomentumBalance  # noqa: E402,F401
from porepy_tpu.models.poromechanics import Poromechanics  # noqa: E402,F401
from porepy_tpu.models.thermoporomechanics import (  # noqa: E402,F401
    Thermoporomechanics,
)
from porepy_tpu.numerics.fv.biot import Biot  # noqa: E402,F401
from porepy_tpu.numerics.fv.mpfa import Mpfa  # noqa: E402,F401
from porepy_tpu.numerics.fv.mpsa import Mpsa  # noqa: E402,F401
from porepy_tpu.numerics.fv.tpsa import Tpsa  # noqa: E402,F401
from porepy_tpu.numerics.vem.mvem import MVEM  # noqa: E402,F401
from porepy_tpu.numerics.vem.hybrid import HybridDualVEM  # noqa: E402,F401
from porepy_tpu.numerics.vem.mass_matrix import (  # noqa: E402,F401
    MixedInvMassMatrix,
    MixedMassMatrix,
)
from porepy_tpu.numerics.vem.vem_source import (  # noqa: E402,F401
    DualScalarSource,
)
from porepy_tpu.numerics.fem.rt0 import RT0  # noqa: E402,F401
from porepy_tpu.models import energy_balance  # noqa: E402,F401
from porepy_tpu.models import compositional_flow  # noqa: E402,F401
from porepy_tpu.models import fracture_damage  # noqa: E402,F401
from porepy_tpu.models.compositional_flow import (  # noqa: E402,F401
    CompositionalFlowTemplate,
    CompositionalFractionalFlowTemplate,
)
from porepy_tpu.models.run_models import (  # noqa: E402,F401
    run_stationary_model,
    run_time_dependent_model,
)
from porepy_tpu.viz.data_saving_model_mixin import DataSavingMixin  # noqa: E402,F401
from porepy_tpu.viz.solver_statistics import SolverStatistics  # noqa: E402,F401
from porepy_tpu.viz.diagnostics_mixin import DiagnosticsMixin  # noqa: E402,F401
from porepy_tpu.viz.plot_grid import plot_grid, save_img  # noqa: E402,F401

# -- reference-parity namespace breadth (modules, classes, helpers) -----------
from porepy_tpu.utils.common_constants import (  # noqa: E402,F401
    DISCRETIZATION,
    PRIMARY_VARIABLES,
    SECOND,
    YEAR,
    METER,
    KILOGRAM,
    GRAM,
    NEWTON,
    JOULE,
    WATT,
    KELVIN,
    MOLE,
    RADIAN,
    DEGREE,
    Celsius_to_Kelvin,
    Kelvin_to_Celsius,
)
from porepy_tpu.utils.porepy_types import (  # noqa: E402,F401
    DomainFunctionType,
    ExtendedDomainFunctionType,
    GridLike,
    GridLikeSequence,
    SubdomainsOrBoundaries,
    discretization_type,
    fracture_network,
    number,
)
from porepy_tpu.utils import adtree  # noqa: E402,F401
from porepy_tpu.utils import array_operations  # noqa: E402,F401
from porepy_tpu.utils import grid_utils  # noqa: E402,F401
from porepy_tpu.utils import permutations  # noqa: E402,F401
from porepy_tpu.utils.interpolation_tables import (  # noqa: E402,F401
    AdaptiveInterpolationTable,
    InterpolationTable,
)
from porepy_tpu.utils.tangential_normal_projection import (  # noqa: E402,F401
    TangentialNormalProjection,
    set_local_coordinate_projections,
    sides_of_fracture,
)
from porepy_tpu.numerics.linalg import matrix_operations  # noqa: E402,F401
from porepy_tpu.numerics.ad.equation_system import EquationSystem  # noqa: E402,F401
from porepy_tpu.numerics.ad.operators import (  # noqa: E402,F401
    wrap_as_dense_ad_array,
    wrap_as_sparse_ad_array,
)
from porepy_tpu.numerics.fv.upwind import UpwindCoupling  # noqa: E402,F401
from porepy_tpu.numerics.vem.dual_elliptic import project_flux  # noqa: E402,F401
from porepy_tpu.numerics import displacement_correlation  # noqa: E402,F401
from porepy_tpu.numerics.fracture_deformation import (  # noqa: E402,F401
    propagate_fracture,
)
from porepy_tpu.params.bc import face_on_side  # noqa: E402,F401
from porepy_tpu.grids.mortar_grid import MortarGrid  # noqa: E402,F401
from porepy_tpu.grids import grid_extrusion, partition, refinement  # noqa: E402,F401
from porepy_tpu.geometry import geometry_property_checks  # noqa: E402,F401
from porepy_tpu.geometry import domain as domain  # noqa: E402,F401
from porepy_tpu.fracs import utils as frac_utils  # noqa: E402,F401
from porepy_tpu.fracs import fracture_importer, meshing  # noqa: E402,F401
from porepy_tpu.models import (  # noqa: E402,F401
    contact_mechanics,
    fluid_mass_balance,
    mass_and_energy_balance,
    momentum_balance,
    poromechanics,
    thermoporomechanics,
)
from porepy_tpu import models  # noqa: E402,F401
from porepy_tpu.viz.exporter import Exporter  # noqa: E402,F401
from porepy_tpu.viz.fracture_visualization import (  # noqa: E402,F401
    plot_fractures,
    plot_wells,
)
from porepy_tpu import applications  # noqa: E402,F401
from porepy_tpu.applications.md_grids import (  # noqa: E402,F401
    domains,
    fracture_sets,
    mdg_library,
    model_geometries,
)
from porepy_tpu.applications.boundary_conditions import (  # noqa: E402,F401
    model_boundary_conditions,
)
from porepy_tpu.applications.material_values import (  # noqa: E402,F401
    fluid_values,
    numerical_values,
    reference_values,
    solid_values,
)
from porepy_tpu.numerics.fv.fv_elliptic import FVElliptic  # noqa: E402,F401
from porepy_tpu.models.contact_mechanics import ContactMechanics  # noqa: E402,F401
