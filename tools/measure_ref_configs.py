"""Measure the reference framework's per-Newton-iteration wall-clock on the
BASELINE.md benchmark configs (run on this machine, via tools.refshim).

Configs (BASELINE.md "Benchmark configs"):
  2. Mpfa single-phase flow on a 2D md fracture network (6 fractures,
     cartesian md grid, mortar coupling) — reference SinglePhaseFlow.
  4. Mpsa/Biot poromechanics (Mandel-family consolidation BCs, no
     fractures) — reference Poromechanics.

Per-iteration time = assembly (EquationSystem.assemble) + linear solve
(scipy spsolve; PyPardiso is not in this image — recorded as such), the
same split the reference logs at ``models/solution_strategy.py:820-877``.
Results are merged into ``tools/ref_baselines.json``.

Usage: NUMBA_DISABLE_JIT=1 python tools/measure_ref_configs.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.refshim import pp as ref_pp

# Shared benchmark geometry: 6 axis-aligned fractures on the unit square,
# crossing -> 1d fracture grids, 0d intersection grids, full mortar stack.
FRACTURES_2D = [
    np.array([[0.125, 0.875], [0.25, 0.25]]),
    np.array([[0.125, 0.875], [0.5, 0.5]]),
    np.array([[0.125, 0.875], [0.75, 0.75]]),
    np.array([[0.25, 0.25], [0.125, 0.875]]),
    np.array([[0.5, 0.5], [0.125, 0.875]]),
    np.array([[0.75, 0.75], [0.125, 0.875]]),
]


def _timing_mixin(base):
    class Timed(base):
        def __init__(self, params):
            super().__init__(params)
            self.iter_times: list[tuple[float, float]] = []
            self._t_assembly = 0.0

        def assemble_linear_system(self):
            t0 = time.perf_counter()
            super().assemble_linear_system()
            self._t_assembly = time.perf_counter() - t0

        def solve_linear_system(self):
            t0 = time.perf_counter()
            out = super().solve_linear_system()
            self.iter_times.append((self._t_assembly, time.perf_counter() - t0))
            return out

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    return Timed


def measure_md_flow(cell_size: float) -> dict:
    class Model(_timing_mixin(ref_pp.SinglePhaseFlow)):
        def set_fractures(self):
            self._fractures = [ref_pp.LineFracture(f) for f in FRACTURES_2D]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": {
            "solid": ref_pp.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": ref_pp.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": ref_pp.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    t0 = time.perf_counter()
    m = Model(params)
    ref_pp.run_time_dependent_model(m, params)
    total = time.perf_counter() - t0
    times = np.array(m.iter_times)
    return {
        "num_cells": int(sum(sd.num_cells for sd in m.mdg.subdomains())),
        "num_dofs": int(m.equation_system.num_dofs()),
        "iters_measured": len(times),
        "assembly_s": float(np.median(times[:, 0])),
        "solve_s": float(np.median(times[:, 1])),
        "total_s": float(np.median(times.sum(axis=1))),
        "wall_total_s": total,
    }


def measure_biot(cell_size: float) -> dict:
    class Model(_timing_mixin(ref_pp.Poromechanics)):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": {
            "solid": ref_pp.SolidConstants(
                shear_modulus=1.0,
                lame_lambda=1.0,
                permeability=1e-2,
                porosity=0.1,
                biot_coefficient=0.8,
                specific_storage=0.1,
            ),
            "fluid": ref_pp.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=1e-2
            ),
        },
        "time_manager": ref_pp.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    t0 = time.perf_counter()
    m = Model(params)
    ref_pp.run_time_dependent_model(m, params)
    total = time.perf_counter() - t0
    times = np.array(m.iter_times)
    return {
        "num_cells": int(sum(sd.num_cells for sd in m.mdg.subdomains())),
        "num_dofs": int(m.equation_system.num_dofs()),
        "iters_measured": len(times),
        "assembly_s": float(np.median(times[:, 0])),
        "solve_s": float(np.median(times[:, 1])),
        "total_s": float(np.median(times.sum(axis=1))),
        "wall_total_s": total,
    }


def measure_tracer(cell_size: float) -> dict:
    """Config 3: tracer transport (upwind + implicit Euler) on a fractured
    2d grid — the reference's own tracer example model
    (``examples/tracer_flow.py:108``) with two crossing fractures."""
    from porepy.examples.tracer_flow import TracerFlowModel

    class Model(_timing_mixin(TracerFlowModel)):
        pass

    params = {
        "material_constants": {
            "solid": ref_pp.SolidConstants(
                porosity=0.1, permeability=1e-7, normal_permeability=1e-7,
                residual_aperture=1e-2,
            ),
        },
        "fracture_indices": [0, 1],
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
        "time_manager": ref_pp.TimeManager(
            [0, 3 * 60.0], 60.0, constant_dt=True
        ),
        "max_iterations": 30,
        "nl_convergence_tol": 1e-8,
        "nl_convergence_tol_res": 1e-8,
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    t0 = time.perf_counter()
    m = Model(params)
    ref_pp.run_time_dependent_model(m, params)
    total = time.perf_counter() - t0
    times = np.array(m.iter_times)
    return {
        "num_cells": int(sum(sd.num_cells for sd in m.mdg.subdomains())),
        "num_dofs": int(m.equation_system.num_dofs()),
        "iters_measured": len(times),
        "assembly_s": float(np.median(times[:, 0])),
        "solve_s": float(np.median(times[:, 1])),
        "total_s": float(np.median(times.sum(axis=1))),
        "wall_total_s": total,
    }


def measure_thm_contact_3d(cell_size: float) -> dict:
    """Config 5 stand-in: thermoporomechanics with frictional contact on a
    3d cartesian md grid with four square fractures (the 52-fracture
    showcase scaled to what meshes in-image; reference
    ``models/thermoporomechanics.py:225`` + contact mechanics)."""

    class Model(_timing_mixin(ref_pp.Thermoporomechanics)):
        def set_domain(self):
            self._domain = ref_pp.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )

        def set_fractures(self):
            f = []
            for z in (0.25, 0.5, 0.75):
                f.append(ref_pp.PlaneFracture(np.array(
                    [[0.25, 0.75, 0.75, 0.25], [0.25, 0.25, 0.75, 0.75],
                     [z, z, z, z]]
                )))
            f.append(ref_pp.PlaneFracture(np.array(
                [[0.5, 0.5, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75],
                 [0.25, 0.75, 0.75, 0.25]]
            )))
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
        "meshing_arguments": {"cell_size": cell_size},
        "material_constants": {
            "solid": ref_pp.SolidConstants(
                residual_aperture=0.01,
                normal_permeability=1.0,
                permeability=1.0,
                porosity=0.1,
                thermal_expansion=1e-4,
                thermal_conductivity=1.0,
                specific_heat_capacity=1.0,
                biot_coefficient=0.8,
            ),
            "fluid": ref_pp.FluidComponent(
                compressibility=1e-3,
                viscosity=1.0,
                density=1.0,
                thermal_conductivity=0.5,
                specific_heat_capacity=1.0,
                thermal_expansion=2e-4,
            ),
        },
        "time_manager": ref_pp.TimeManager([0, 3.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    t0 = time.perf_counter()
    m = Model(params)
    ref_pp.run_time_dependent_model(m, params)
    total = time.perf_counter() - t0
    times = np.array(m.iter_times)
    return {
        "num_cells": int(sum(sd.num_cells for sd in m.mdg.subdomains())),
        "num_dofs": int(m.equation_system.num_dofs()),
        "iters_measured": len(times),
        "assembly_s": float(np.median(times[:, 0])),
        "solve_s": float(np.median(times[:, 1])),
        "total_s": float(np.median(times.sum(axis=1))),
        "wall_total_s": total,
    }


def _mirror_subdomains_to_reference(subdomains):
    """Rebuild porepy_tpu per-dim tet/tri/line/point grid lists as
    reference grid objects (same nodes/connectivity/global point ids) —
    so both frameworks time the IDENTICAL unstructured mesh."""
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
                from porepy.fracs.msh_2_grid import create_embedded_line_grid

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


def measure_berre3d(n: int) -> dict:
    """Berre et al. 2021 case 2 (9 fractures) on the native
    fracture-conforming structured-tet mesh, mirrored into reference grid
    objects — compressible single-phase md flow, same setup as bench.py's
    ``berre3d_case2_flow``."""
    import porepy_tpu as pt
    from porepy_tpu.fracs import fracture_importer
    from porepy_tpu.fracs.structured_simplex import tet_subdomain_lists

    lib = os.path.join(
        os.path.dirname(pt.__file__),
        "applications/md_grids/file_library/benchmark_3d_case_2",
    )
    network = fracture_importer.network_3d_from_csv(
        os.path.join(lib, "fracture_network.csv")
    )
    sub = tet_subdomain_lists(
        [f.pts for f in network.fractures],
        np.array([n] * 3),
        physdims=[1, 1, 1],
    )
    sub_ref = _mirror_subdomains_to_reference(sub)
    mdg = ref_pp.meshing.subdomains_to_mdg(sub_ref)
    mdg.compute_geometry()

    class Model(_timing_mixin(ref_pp.SinglePhaseFlow)):
        def set_geometry(self):
            self.mdg = mdg
            self.nd = 3
            self._domain = ref_pp.Domain(
                {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1,
                 "zmin": 0, "zmax": 1}
            )
            self.set_well_network()

        def bc_values_pressure(self, bg):
            return 1.0e5 + 1.0e4 * (1.0 - bg.cell_centers[0])

    params = {
        "material_constants": {
            "solid": ref_pp.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=1e-2,
                normal_permeability=1.0,
            ),
            "fluid": ref_pp.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": ref_pp.TimeManager([0, 5.0], 1.0, constant_dt=True),
        "linear_solver": "scipy_sparse",
        "progressbars": False,
    }
    t0 = time.perf_counter()
    m = Model(params)
    ref_pp.run_time_dependent_model(m, params)
    total = time.perf_counter() - t0
    times = np.array(m.iter_times)
    return {
        "num_cells": int(sum(sd.num_cells for sd in m.mdg.subdomains())),
        "num_dofs": int(m.equation_system.num_dofs()),
        "iters_measured": len(times),
        "assembly_s": float(np.median(times[:, 0])),
        "solve_s": float(np.median(times[:, 1])),
        "total_s": float(np.median(times.sum(axis=1))),
        "wall_total_s": total,
    }


CONFIGS = {
    "mdflow_mpfa_2d_128": lambda: measure_md_flow(1.0 / 128),
    "mdflow_mpfa_2d_256": lambda: measure_md_flow(1.0 / 256),
    "biot_poromech_2d_64": lambda: measure_biot(1.0 / 64),
    "tracer_2d_64": lambda: measure_tracer(1.0 / 64),
    "thm_contact_3d_16": lambda: measure_thm_contact_3d(1.0 / 16),
    "berre3d_case2_flow_16": lambda: measure_berre3d(16),
}


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_baselines.json")
    with open(path) as f:
        base = json.load(f)

    selected = sys.argv[1:] or list(CONFIGS)
    for name in selected:
        print(f"measuring {name} ...", flush=True)
        base["cases"][name] = CONFIGS[name]()
        print(json.dumps(base["cases"][name]), flush=True)
        with open(path, "w") as f:
            json.dump(base, f, indent=2)

    base["cases_note"] = (
        "reference framework measured in-image via tools.refshim "
        "(NUMBA_DISABLE_JIT=1 affects one-time discretization only, not the "
        "per-iteration assembly+solve recorded here); linear_solver=scipy "
        "spsolve (PyPardiso not in image); medians over the measured Newton "
        "iterations."
    )
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print("written", path)


if __name__ == "__main__":
    main()
