"""Benchmark: assembly+solve wall-clock per Newton iteration, through the
REAL framework path (EquationSystem device assembly + DeviceLinearSolver +
fused device Newton/time-block), on the BASELINE.md benchmark configs:

  - config 1 (headline): compressible single-phase flow on a 3d 32^3 grid
    via ``SinglePhaseFlow`` — the problem where the reference's spsolve
    takes 6.7 s/iteration.
  - config 2: Mpfa single-phase flow on a 2D md fracture network (6
    crossing fractures, mortar coupling, 0d intersections), at 1/128 and
    1/256.
  - config 3: tracer transport (in-kernel upwinding + implicit Euler).
  - config 4: Biot poromechanics via ``Poromechanics`` (fixed-stress
    field-split preconditioner).
  - config 5: thermoporomechanics with frictional contact, 3d, four
    fractures (ref baseline 54.7 s/iter) and Berre et al. 3d benchmark
    case 2 md flow (ref baseline 98.3 s/iter).
  - sanity: the bespoke structured-TPFA device kernel, and a 1-device
    sharded-path anchor.

Baselines: the reference framework's per-iteration scipy assembly + spsolve
on identical problems, measured on this machine (tools/ref_baselines.json,
provenance inside; remeasure with tools/measure_ref_configs.py).

Harness design (round-5 rework — every earlier round lost cases to
deadline kills that left zero data):
  - each case runs in its own subprocess under a hard deadline, but EMITS
    PROGRESS as it goes (one JSON line per completed phase to a progress
    file); a timeout now yields a partial record (setup_s/steps seen) in
    the final artifact instead of nothing.
  - the persistent XLA compilation cache lives in-repo (``.jax_cache/``,
    untracked) and is pre-warmed by any prior run on this machine: jax
    0.9 silently ignores the JAX_COMPILATION_CACHE_DIR env var (config
    flag only — porepy_tpu/__init__.py applies it), which is why rounds
    1-4 paid full single-core recompiles (minutes per case) every run.
  - time stepping uses the fused multi-step device block
    (``fused_time_steps``): steps 1-2 run per-step (compile + eligibility
    observation), the rest run as ONE dispatch; per-iteration wall is the
    block wall / Newton iterations inside it — no host round-trips or
    dispatch latency in the measured region.
  - the headline is never NaN: falls back across cases and emits null if
    truly nothing ran (RFC 8259: NaN is not JSON).

Prints ONE JSON line; headline = config 1 through the framework.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache")
)

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


# -- child-side progress reporting -------------------------------------------

_PROGRESS_PATH = os.environ.get("BENCH_PROGRESS_FILE")
_T0 = time.perf_counter()


def _emit(**kw) -> None:
    """One JSON progress line per completed phase: written to the progress
    file (parent reads it after a deadline kill) and mirrored to stderr."""
    kw["t"] = round(time.perf_counter() - _T0, 3)
    line = json.dumps(kw)
    print(f"## {line}", file=sys.stderr, flush=True)
    if _PROGRESS_PATH:
        with open(_PROGRESS_PATH, "a") as f:
            f.write(line + "\n")


def _timed(base):
    import porepy_tpu as pt  # noqa: F401

    class Timed(base):
        def __init__(self, params):
            super().__init__(params)
            self.step_times: list[tuple[float, int]] = []
            self.block_times: list[tuple[float, int, int, int]] = []
            self.iter_times: list[tuple[float, float]] = []
            self._t_assembly = 0.0

        def prepare_simulation(self):
            t0 = time.perf_counter()
            out = super().prepare_simulation()
            _emit(phase="prepare", s=round(time.perf_counter() - t0, 3))
            return out

        def fused_newton_loop(self, nl_params):
            before = self.nonlinear_solver_statistics.num_iteration
            t0 = time.perf_counter()
            out = super().fused_newton_loop(nl_params)
            dt = time.perf_counter() - t0
            if out:
                k = max(
                    self.nonlinear_solver_statistics.num_iteration - before, 1
                )
                self.step_times.append((dt, int(k)))
                _emit(phase="step", wall_s=round(dt, 3), newton_iters=int(k))
            return out

        def fused_time_block(self, n_steps, nl_params):
            t0 = time.perf_counter()
            n_done = super().fused_time_block(n_steps, nl_params)
            dt = time.perf_counter() - t0
            if n_done > 0:
                rec = getattr(self, "_ftb_last", {})
                self.block_times.append(
                    (
                        dt,
                        n_done,
                        int(rec.get("newton_iters", n_done)),
                        int(rec.get("krylov_iters", 0)),
                    )
                )
                _emit(
                    phase="block",
                    wall_s=round(dt, 3),
                    steps=n_done,
                    newton_iters=int(rec.get("newton_iters", n_done)),
                    krylov_iters=int(rec.get("krylov_iters", 0)),
                )
            return n_done

        # Host-orchestrated fallback path instrumentation.
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
            self.iter_times.append(
                (self._t_assembly, time.perf_counter() - t0)
            )
            return out

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    return Timed


def _summarize(m) -> dict:
    """Per-Newton-iteration wall. Preferred source: fused multi-step
    blocks (pure device-resident stepping, the deployment configuration).
    Fallbacks: per-step fused dispatches excluding the first (compile);
    host-orchestrated per-iteration split."""
    nnz = 0
    for cs in m.equation_system._compiled_systems.values():
        nnz = max(nnz, cs.indices_np.shape[0])
    out = {
        "num_dofs": int(m.equation_system.num_dofs()),
        "nnz": int(nnz),
    }
    if m.block_times:
        # The FIRST block dispatch carries the one-time program
        # compile/load; with >= 2 blocks only the warm ones are measured.
        blocks = m.block_times[1:] if len(m.block_times) > 1 else m.block_times
        wall = sum(b[0] for b in blocks)
        iters = sum(b[2] for b in blocks)
        out.update(
            mode="fused_block",
            blocks_measured=len(blocks),
            first_block_s=round(m.block_times[0][0], 3),
            steps_in_blocks=int(sum(b[1] for b in blocks)),
            iters_measured=int(iters),
            krylov_iters=int(sum(b[3] for b in blocks)),
            total_ms=round(wall * 1000.0 / max(iters, 1), 3),
        )
        if m.step_times:
            warm = m.step_times[1:] or m.step_times
            out["per_step_dispatch_ms"] = round(
                float(np.median([w / k for w, k in warm])) * 1000.0, 3
            )
    elif m.step_times:
        warm = m.step_times[1:] if len(m.step_times) > 1 else m.step_times
        per_iter = [w / k for w, k in warm]
        out.update(
            mode="fused_step",
            iters_measured=int(sum(k for _w, k in warm)),
            total_ms=round(float(np.median(per_iter)) * 1000.0, 3),
        )
    elif m.iter_times:
        times = np.array(m.iter_times[2:] or m.iter_times)
        out.update(
            mode="host_loop",
            iters_measured=len(times),
            assembly_ms=round(float(np.median(times[:, 0])) * 1000.0, 3),
            solve_ms=round(float(np.median(times[:, 1])) * 1000.0, 3),
            total_ms=round(float(np.median(times.sum(axis=1))) * 1000.0, 3),
        )
    stats = None
    for solver in getattr(m, "_device_solvers", {}).values():
        stats = getattr(solver, "last_stats", None)
    if stats is not None:
        out["krylov_iters_last"] = stats["krylov_iters"]
    return out


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


def run_md_flow(cell_size: float = 1.0 / 128) -> dict:
    import porepy_tpu as pt

    class Model(_timed(pt.SinglePhaseFlow)):
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
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


def run_md_flow_256() -> dict:
    return run_md_flow(cell_size=1.0 / 256)


def run_sharded_anchor() -> dict:
    """Sanity anchor for the sharded path on the single real chip: one
    Newton solve of the md-flow config through ``ShardedNewton`` on a
    1-device mesh. Should track the unsharded solve time — a large gap
    means the sharding layer itself adds overhead."""
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
        "material_constants": _mat_flow(),
        "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    t0 = time.perf_counter()
    m.prepare_simulation()
    _emit(phase="prepare", s=round(time.perf_counter() - t0, 3))
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    sn = ShardedNewton(m, make_dof_mesh(1))
    t0 = time.perf_counter()
    sn.solve_once()  # compile
    _emit(phase="compile", s=round(time.perf_counter() - t0, 3))
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
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


def run_3d_framework() -> dict:
    """Config 1 through the REAL framework path: compressible single-phase
    flow on a 3d 32^3 cartesian grid via ``SinglePhaseFlow`` — the same
    problem the reference baseline ``tpfa_flow_3d_32cubed`` measures with
    scipy assembly + spsolve (see tools/ref_baselines.json)."""
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
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


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

    t0 = time.perf_counter()
    mdg, _network = benchmark_3d_case_2(refinement_level=0)
    _emit(phase="mesh", s=round(time.perf_counter() - t0, 3))

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
        "time_manager": pt.TimeManager([0, 10.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 4,
        "fused_commit_states": "tail",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


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
        "time_manager": pt.TimeManager(
            [0, 26 * 60.0], 60.0, constant_dt=True
        ),
        "max_iterations": 30,
        "nl_convergence_tol": 1e-8,
        "nl_convergence_tol_res": 1e-8,
        "linear_solver": "device_gmres",
        "fused_time_steps": 8,
        "fused_commit_states": "tail",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


def run_thm_contact_3d() -> dict:
    """Config 5 stand-in: thermoporomechanics with frictional contact on a
    3d cartesian md grid with four square fractures, identical setup to
    tools/measure_ref_configs.py::measure_thm_contact_3d. Reference
    baseline: 54.7 s per Newton iteration (scipy spsolve)."""
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
        "time_manager": pt.TimeManager([0, 10.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_time_steps": 4,
        "fused_commit_states": "tail",
    }
    m = Model(params)
    pt.run_time_dependent_model(m, params)
    return _summarize(m)


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
    t0 = time.perf_counter()
    jax.block_until_ready(step(p_prev, p_prev))
    _emit(phase="compile", s=round(time.perf_counter() - t0, 3))
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
# Caps assume the in-repo compile cache is warm (it ships pre-warmed; see
# module docstring) with ~3x margin on measured warm walls; a cold-cache
# run dies at its cap but still leaves per-phase progress in the artifact.
_CASES = (
    ("structured", "tpfa_structured_3d_32cubed", "run_structured", "tpfa_flow_3d_32cubed", 120),
    ("3d", "tpfa_flow_3d_32cubed_framework", "run_3d_framework", "tpfa_flow_3d_32cubed", 200),
    ("md", "mdflow_mpfa_2d_128", "run_md_flow", "mdflow_mpfa_2d_128", 180),
    ("thm", "thm_contact_3d_16", "run_thm_contact_3d", "thm_contact_3d_16", 620),
    ("berre3d", "berre3d_case2_flow_16", "run_berre3d", "berre3d_case2_flow_16", 620),
    ("biot", "biot_poromech_2d_64", "run_biot", "biot_poromech_2d_64", 180),
    ("md256", "mdflow_mpfa_2d_256", "run_md_flow_256", "mdflow_mpfa_2d_256", 200),
    ("tracer", "tracer_2d_64", "run_tracer", "tracer_2d_64", 150),
    ("sharded", "mdflow_sharded_1dev_anchor", "run_sharded_anchor", "mdflow_mpfa_2d_128", 140),
)


_PULL_PROBE = """
import sys
import jax, jax.numpy as jnp
devs = [d for d in jax.devices() if d.platform != "cpu"]
if not devs:
    sys.exit(2)  # no accelerator registered at all
s = jnp.sum(jax.device_put(jnp.ones(8, jnp.float32), devs[0]) * 2.0)
print(float(s))  # the device->host pull under test
"""


def _accel_pull_ok(timeout_s: float = 45.0):
    """Probe (in a throwaway subprocess) whether the accelerator can
    return results to the host. The tunneled TPU backend has a measured
    failure mode where dispatch and execution work but EVERY device->host
    fetch — even 8 bytes — blocks for longer than any case deadline;
    benchmarking through it then produces nothing. Returns True / False /
    None (None = no accelerator registered)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", _PULL_PROBE],
            capture_output=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    if r.returncode == 2:
        return None
    return r.returncode == 0


def _run_case_child(flag: str) -> None:
    """Child-process entry: run ONE case and print its result dict as the
    single stdout line (rc=0 even on case failure — the failure is data)."""
    note = None
    cpu_requested = "cpu" in [
        p.strip() for p in os.environ.get("JAX_PLATFORMS", "").split(",")
    ]
    if not cpu_requested and os.environ.get("BENCH_SKIP_PULL_PROBE") != "1":
        # The parent probes once and passes the verdict down; a direct
        # ``--case`` invocation probes for itself.
        wedged = os.environ.get("BENCH_PULL_WEDGED")
        ok = (wedged != "1") if wedged is not None else _accel_pull_ok()
        if ok is False:
            if os.environ.get("BENCH_REQUIRE_TPU") == "1":
                print(
                    json.dumps(
                        {"error": "accelerator device->host pulls wedged"}
                    ),
                    flush=True,
                )
                return
            # Honest fallback: run the case on the CPU XLA backend and SAY
            # SO — a labeled CPU number beats a deadline kill with no data.
            import jax

            jax.config.update("jax_platforms", "cpu")
            note = "cpu (accelerator device->host pulls wedged; see probe)"
            _emit(phase="pull_probe", wedged=True)

    import jax

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
            out["backend"] = note or jax.default_backend()
            _emit(phase="done")
            print(json.dumps(out), flush=True)
            return
    print(json.dumps({"error": f"unknown case {flag!r}"}), flush=True)


def _partial_from_progress(path: str) -> dict:
    """Reconstruct what a deadline-killed case managed to do from its
    progress file: per-phase timings and any measured steps/blocks."""
    out: dict = {}
    steps: list = []
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                ph = rec.pop("phase", None)
                rec.pop("t", None)
                if ph in ("prepare", "mesh", "compile"):
                    out[f"{ph}_s"] = rec.get("s")
                elif ph == "step":
                    steps.append(rec)
                elif ph == "block":
                    out["block"] = rec
    except OSError:
        return {}
    if steps:
        out["steps_seen"] = len(steps)
        out["last_step_wall_s"] = steps[-1].get("wall_s")
    blk = out.pop("block", None)
    if blk and blk.get("newton_iters"):
        # Enough ran to produce a real per-iteration number.
        out["total_ms"] = round(
            blk["wall_s"] * 1000.0 / max(blk["newton_iters"], 1), 3
        )
        out["iters_measured"] = blk["newton_iters"]
        out["mode"] = "fused_block(partial)"
    return out


def main() -> None:
    import subprocess

    with open(os.path.join(_HERE, "tools/ref_baselines.json")) as f:
        base = json.load(f)["cases"]

    selected = os.environ.get(
        "BENCH_CASES",
        "structured,3d,md,thm,berre3d,biot,md256,tracer,sharded",
    ).split(",")
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "1500"))
    t_start = time.perf_counter()
    cases: dict = {}
    fallbacks = 0

    def _aggregate() -> str:
        """The ONE summary JSON line. Printed after every completed case
        (not just at the end) so that even an external kill of this parent
        leaves the best-so-far snapshot as the last stdout line."""
        order = (
            "tpfa_flow_3d_32cubed_framework",
            "mdflow_mpfa_2d_128",
            "thm_contact_3d_16",
            "berre3d_case2_flow_16",
            "biot_poromech_2d_64",
            "tpfa_structured_3d_32cubed",
        )
        head, metric = None, None
        for key in order:
            c = cases.get(key)
            if isinstance(c, dict) and "total_ms" in c:
                head, metric = c, f"{key}_newton_iter_wall"
                break
        snap = dict(cases)
        snap["device_fallbacks"] = fallbacks
        return json.dumps(
            {
                "metric": metric or "newton_iter_wall",
                "value": None if head is None else head["total_ms"],
                "unit": "ms",
                "vs_baseline": None
                if head is None
                else head.get("vs_baseline"),
                "cases": snap,
            }
        )

    # One pull-path probe for the whole run (see _accel_pull_ok); children
    # inherit the verdict instead of re-probing.
    cpu_requested = "cpu" in [
        p.strip() for p in os.environ.get("JAX_PLATFORMS", "").split(",")
    ]
    pull_ok = True if cpu_requested else _accel_pull_ok()
    os.environ["BENCH_PULL_WEDGED"] = "1" if pull_ok is False else "0"
    if pull_ok is False:
        print(
            "# accelerator device->host pulls WEDGED: cases fall back to "
            "the CPU XLA backend (results carry backend='cpu (...)')",
            file=sys.stderr,
            flush=True,
        )

    for flag, name, _fn, baseline_key, cap in _CASES:
        if flag not in selected:
            continue
        remaining = budget - (time.perf_counter() - t_start)
        if remaining < 40.0:
            cases[name] = {"skipped": "budget"}
            print(f"# {flag}: skipped (budget)", file=sys.stderr, flush=True)
            continue
        deadline = min(cap, remaining - 10.0)
        progress = f"/tmp/ppt_bench_{flag}.progress.jsonl"
        try:
            os.remove(progress)
        except OSError:
            pass
        env = dict(os.environ, BENCH_PROGRESS_FILE=progress)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", flag],
                capture_output=True,
                text=True,
                timeout=deadline,
                cwd=_HERE,
                env=env,
            )
            line = (
                proc.stdout.strip().splitlines()[-1]
                if proc.stdout.strip()
                else ""
            )
            out = json.loads(line) if line.startswith("{") else {
                "error": f"no output (rc={proc.returncode})",
                "stderr_tail": proc.stderr[-400:],
            }
        except subprocess.TimeoutExpired:
            out = {"deadline_s": deadline}
            out.update(_partial_from_progress(progress))
            if "total_ms" not in out:
                out["skipped"] = f"case deadline ({deadline:.0f}s)"
        except Exception as exc:  # pragma: no cover - harness robustness
            out = {"error": f"{type(exc).__name__}: {exc}"}
        fallbacks += int(out.pop("fallbacks", 0) or 0)
        if baseline_key in base and "total_ms" in out:
            out["vs_baseline"] = round(
                base[baseline_key]["total_s"] * 1000.0 / out["total_ms"], 1
            )
            out["ref_total_ms"] = round(
                base[baseline_key]["total_s"] * 1000.0, 1
            )
        cases[name] = out
        print(f"# {flag}:", json.dumps(out), file=sys.stderr, flush=True)
        print(_aggregate(), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        _run_case_child(sys.argv[2])
    else:
        main()
