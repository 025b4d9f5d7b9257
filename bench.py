"""Benchmark: assembly+solve wall-clock per Newton iteration, through the
REAL framework path (EquationSystem.assemble_device + DeviceLinearSolver),
on the BASELINE.md benchmark configs:

  - config 1 (headline): compressible single-phase flow on a 3d 32^3 grid
    via ``SinglePhaseFlow`` — the real framework path on the problem where
    the reference's spsolve takes 6.7 s/iteration.
  - config 2: Mpfa single-phase flow on a 2D md fracture network
    (6 crossing fractures, cartesian md grid, mortar coupling and 0d
    intersection grids) via ``SinglePhaseFlow``.
  - config 4: Biot poromechanics (Mandel-family consolidation BCs) via
    ``Poromechanics`` with the fixed-stress field-split preconditioner.
  - sanity: the bespoke structured-TPFA device kernel.

Baselines: the reference framework's per-iteration scipy assembly + spsolve
on identical problems, measured on this machine (tools/ref_baselines.json,
provenance inside; remeasure with tools/measure_ref_configs.py).

Prints ONE JSON line; headline = config 1 through the framework. ``cases``
carries the full breakdown including an effective-HBM-bandwidth figure for
the solve (matvec bytes moved / solve time).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Honor an explicit platform request (e.g. JAX_PLATFORMS=cpu for a smoke
# run): the TPU plugin force-registers itself regardless of the env var,
# so the config update below is the authoritative switch.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    plat = os.environ["JAX_PLATFORMS"]
    if "cpu" not in [p.strip() for p in plat.split(",")]:
        plat += ",cpu"  # the host backend must stay initializable
    jax.config.update("jax_platforms", plat)

FRACTURES_2D = [
    np.array([[0.125, 0.875], [0.25, 0.25]]),
    np.array([[0.125, 0.875], [0.5, 0.5]]),
    np.array([[0.125, 0.875], [0.75, 0.75]]),
    np.array([[0.25, 0.25], [0.125, 0.875]]),
    np.array([[0.5, 0.5], [0.125, 0.875]]),
    np.array([[0.75, 0.75], [0.125, 0.875]]),
]


def _timed(base):
    import porepy_tpu as pt  # noqa: F401

    class Timed(base):
        def __init__(self, params):
            super().__init__(params)
            self.iter_times: list[tuple[float, float]] = []
            self.fused_times: list[tuple[float, int]] = []
            self._t_assembly = 0.0

        def fused_newton_loop(self, nl_params):
            # The fused device loop bypasses the per-call hooks; record
            # (wall, newton_iters) per converged time step instead.
            before = self.nonlinear_solver_statistics.num_iteration
            t0 = time.perf_counter()
            out = super().fused_newton_loop(nl_params)
            dt = time.perf_counter() - t0
            if out:
                k = self.nonlinear_solver_statistics.num_iteration - before
                self.fused_times.append((dt, max(int(k), 1)))
            return out

        def assemble_linear_system(self):
            import jax

            t0 = time.perf_counter()
            super().assemble_linear_system()
            if hasattr(self, "_device_assembly"):
                jax.block_until_ready(self._device_assembly[0])
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


def _summarize(m, skip: int) -> dict:
    """Median per-iteration split, excluding the first ``skip`` iterations
    (XLA compile). When the fused device Newton loop handled the steps the
    per-call split does not exist; per-iteration wall is then
    (time-step wall / newton iterations), first time step excluded."""
    nnz = 0
    for cs in m.equation_system._compiled_systems.values():
        nnz = max(nnz, cs.indices_np.shape[0])
    out = {
        "num_dofs": int(m.equation_system.num_dofs()),
        "nnz": int(nnz),
    }
    if m.iter_times:
        times = np.array(m.iter_times[skip:])
        solve_s = float(np.median(times[:, 1]))
        out.update(
            iters_measured=len(times),
            assembly_ms=round(float(np.median(times[:, 0])) * 1000.0, 3),
            solve_ms=round(solve_s * 1000.0, 3),
            total_ms=round(float(np.median(times.sum(axis=1))) * 1000.0, 3),
        )
    else:
        fused = m.fused_times[1:] if len(m.fused_times) > 1 else m.fused_times
        per_iter = [dt / k for dt, k in fused]
        solve_s = float(np.median(per_iter))
        out.update(
            fused=True,
            iters_measured=int(sum(k for _dt, k in fused)),
            solve_ms=round(solve_s * 1000.0, 3),
            total_ms=round(solve_s * 1000.0, 3),
        )
    # Exact Krylov iteration count of the last solve (AMG-preconditioned
    # FGMRES reports actuals, not chunk bounds).
    stats = None
    for solver in getattr(m, "_device_solvers", {}).values():
        stats = getattr(solver, "last_stats", None)
    if stats is not None:
        out["krylov_iters_last"] = stats["krylov_iters"]
    return out


def run_md_flow() -> dict:
    import porepy_tpu as pt

    class Model(_timed(pt.SinglePhaseFlow)):
        def set_fractures(self):
            self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 128},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_sharded_anchor() -> dict:
    """Sanity anchor for the sharded path on the single real chip: one
    Newton solve of the md-flow config through ``ShardedNewton`` on a
    1-device mesh. Should track the unsharded solve time — a large gap
    means the sharding layer itself adds overhead."""
    import time

    import porepy_tpu as pt
    from porepy_tpu.parallel.sharded import ShardedNewton, make_dof_mesh

    class Model(pt.SinglePhaseFlow):
        def set_fractures(self):
            self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]

        def bc_values_pressure(self, bg):
            return 1.0 - bg.cell_centers[1]

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 128},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0,
                porosity=0.1,
                residual_aperture=0.01,
                normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    sn = ShardedNewton(m, make_dof_mesh(1))
    sn.solve_once()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sn.solve_once()
        times.append(time.perf_counter() - t0)
    return {
        "num_dofs": int(m.equation_system.num_dofs()),
        "total_ms": round(float(np.median(times)) * 1000.0, 3),
    }


def run_biot() -> dict:
    import porepy_tpu as pt

    class Model(_timed(pt.Poromechanics)):
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
        "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_3d_framework() -> dict:
    """Config 1 through the REAL framework path: compressible single-phase
    flow on a 3d 32^3 cartesian grid via ``SinglePhaseFlow`` +
    ``EquationSystem.assemble_device`` + ``DeviceLinearSolver`` — the same
    problem the reference baseline ``tpfa_flow_3d_32cubed`` measures with
    scipy assembly + spsolve (see tools/ref_baselines.json description)."""
    import porepy_tpu as pt

    class Model(_timed(pt.SinglePhaseFlow)):
        def set_domain(self):
            self._domain = pt.Domain(
                {
                    "xmin": 0.0,
                    "xmax": 1.0,
                    "ymin": 0.0,
                    "ymax": 1.0,
                    "zmin": 0.0,
                    "zmax": 1.0,
                }
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
        "time_manager": pt.TimeManager([0, 5.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_berre3d() -> dict:
    """Berre et al. 2021 3d benchmark case 2 — 9 fractures with the full
    intersection hierarchy (2d/1d/0d subgrids, ~280 mortar interfaces) on
    the native fracture-conforming structured-tet mesh (~24.6k tets),
    compressible single-phase md flow through the framework device path.
    The reference baseline times the IDENTICAL mesh mirrored into
    reference grid objects (tools/measure_ref_configs.py::measure_berre3d)."""
    import porepy_tpu as pt
    from porepy_tpu.applications.md_grids.mdg_library import (
        benchmark_3d_case_2,
    )

    mdg, _network = benchmark_3d_case_2(refinement_level=0)

    class Model(_timed(pt.SinglePhaseFlow)):
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
        # Three steps: enough Newton iterations for a stable median after
        # the compile-warmup exclusion, inside the per-case deadline.
        "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_tracer() -> dict:
    """Config 3: tracer transport (in-kernel upwinding + implicit Euler) on
    a fractured 2d grid — our tracer example model mirroring the
    reference's (``examples/tracer_flow.py``), identical setup to
    tools/measure_ref_configs.py::measure_tracer."""
    import porepy_tpu as pt
    from porepy_tpu.examples.tracer_flow import TracerFlowModel

    class Model(_timed(TracerFlowModel)):
        pass

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
        "time_manager": pt.TimeManager([0, 3 * 60.0], 60.0, constant_dt=True),
        "max_iterations": 30,
        "nl_convergence_tol": 1e-8,
        "nl_convergence_tol_res": 1e-8,
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_thm_contact_3d() -> dict:
    """Config 5 stand-in: thermoporomechanics with frictional contact on a
    3d cartesian md grid with four square fractures, identical setup to
    tools/measure_ref_configs.py::measure_thm_contact_3d."""
    import porepy_tpu as pt

    class Model(_timed(pt.Thermoporomechanics)):
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
        "time_manager": pt.TimeManager([0, 2.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m, skip=2)


def run_structured() -> dict:
    import jax
    import jax.numpy as jnp

    from porepy_tpu.parallel.structured_flow import build_structured_flow_kernel

    n = 32
    kernel, _ = build_structured_flow_kernel(
        (n, n, n),
        (1.0, 1.0, 1.0),
        permeability=1.0,
        porosity=0.1,
        viscosity=1e-3,
        compressibility=1e-6,
        rho_ref=1000.0,
        p_ref=1.0e5,
        dt=1.0,
        bc_pressure=lambda x, y, z: 1e5 + 1e4 * (1 - np.asarray(x)),
    )
    p_prev = jnp.full(kernel.shape, 2.0e5)
    step = jax.jit(lambda p, q: kernel.newton_step(p, q))
    jax.block_until_ready(step(p_prev, p_prev))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(step(p_prev, p_prev))
        times.append(time.perf_counter() - t0)
    return {
        "num_dofs": n**3,
        "total_ms": round(float(np.median(times)) * 1000.0, 3),
    }


# (flag, case name, runner, baseline key, per-case wall cap in seconds).
# Ordered so the headline and the cheap cases land first: a tight driver
# budget then skips only the tail, and the final JSON line ALWAYS prints
# (round 3 regressed to rc=124 with no parsed headline because one slow
# case ran open-loop; every case now runs in its own subprocess under a
# hard deadline).
_CASES = (
    ("structured", "tpfa_structured_3d_32cubed", "run_structured", "tpfa_flow_3d_32cubed", 150),
    ("3d", "tpfa_flow_3d_32cubed_framework", "run_3d_framework", "tpfa_flow_3d_32cubed", 240),
    ("md", "mdflow_mpfa_2d_128", "run_md_flow", "mdflow_mpfa_2d_128", 200),
    ("biot", "biot_poromech_2d_64", "run_biot", "biot_poromech_2d_64", 200),
    ("thm", "thm_contact_3d_16", "run_thm_contact_3d", "thm_contact_3d_16", 280),
    ("berre3d", "berre3d_case2_flow_16", "run_berre3d", "berre3d_case2_flow_16", 280),
    ("tracer", "tracer_2d_64", "run_tracer", "tracer_2d_64", 160),
    ("sharded", "mdflow_sharded_1dev_anchor", "run_sharded_anchor", "mdflow_mpfa_2d_128", 140),
)


def _run_case_child(flag: str) -> None:
    """Child-process entry: run ONE case and print its result dict as the
    single stdout line (rc=0 even on case failure — the failure is data)."""
    import porepy_tpu  # noqa: F401  (enables x64)
    from porepy_tpu.numerics.linalg.krylov import FALLBACK_COUNTER

    for f, _name, fn_name, _bk, _cap in _CASES:
        if f == flag:
            try:
                out = globals()[fn_name]()
            except Exception as exc:
                import traceback

                traceback.print_exc()
                out = {"error": f"{type(exc).__name__}: {exc}"}
            out["fallbacks"] = FALLBACK_COUNTER["count"]
            print(json.dumps(out), flush=True)
            return
    print(json.dumps({"error": f"unknown case {flag!r}"}), flush=True)


def main() -> None:
    import subprocess
    import sys

    with open(os.path.join(os.path.dirname(__file__), "tools/ref_baselines.json")) as f:
        base = json.load(f)["cases"]

    selected = os.environ.get(
        "BENCH_CASES", "structured,3d,md,biot,thm,berre3d,tracer,sharded"
    ).split(",")
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "660"))
    t_start = time.perf_counter()
    cases: dict = {}
    fallbacks = 0

    for flag, name, _fn, baseline_key, cap in _CASES:
        if flag not in selected:
            continue
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < 40.0:
            cases[name] = {"skipped": "budget"}
            print(f"# {flag}: skipped (budget)", file=sys.stderr, flush=True)
            continue
        deadline = min(cap, remaining - 10.0)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", flag],
                capture_output=True,
                text=True,
                timeout=deadline,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            out = json.loads(line) if line.startswith("{") else {
                "error": f"no output (rc={proc.returncode})",
                "stderr_tail": proc.stderr[-400:],
            }
        except subprocess.TimeoutExpired:
            out = {"skipped": f"case deadline ({deadline:.0f}s)"}
        except Exception as exc:  # pragma: no cover - harness robustness
            out = {"error": f"{type(exc).__name__}: {exc}"}
        fallbacks += int(out.pop("fallbacks", 0) or 0)
        if baseline_key in base and "total_ms" in out:
            out["vs_baseline"] = round(
                base[baseline_key]["total_s"] * 1000.0 / out["total_ms"], 1
            )
            out["ref_total_ms"] = round(base[baseline_key]["total_s"] * 1000.0, 1)
        cases[name] = out
        print(f"# {flag}:", json.dumps(out), file=sys.stderr, flush=True)

    cases["device_fallbacks"] = fallbacks

    # Headline: BASELINE config 1 through the REAL framework path
    # (EquationSystem.assemble_device + DeviceLinearSolver on a 3d grid);
    # md carries the hardest mixed-dimensional case if 3d is unavailable.
    head = cases.get("tpfa_flow_3d_32cubed_framework")
    metric = "tpfa_flow_3d_32cubed_framework_newton_iter_wall"
    if head is None or "total_ms" not in head:
        head = cases.get("mdflow_mpfa_2d_128")
        metric = "mdflow_mpfa_2d_128_newton_iter_wall"
    if head is None or "total_ms" not in head:
        head = {"total_ms": float("nan"), "vs_baseline": float("nan")}

    print(
        json.dumps(
            {
                "metric": metric,
                "value": head["total_ms"],
                "unit": "ms",
                "vs_baseline": head.get("vs_baseline", float("nan")),
                "cases": cases,
            }
        )
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        _run_case_child(sys.argv[2])
    else:
        main()
