"""Benchmark/profiling harness (counterpart of reference
``applications/profiling/run_profiling.py``, which wraps the benchmark
models with viztracer).

TPU-first: instead of a Python tracer, this runner times the model phases
(meshing+prepare, per-iteration assembly, per-iteration solve) and can
record an XLA device trace via ``jax.profiler`` for analysis in
TensorBoard/xprof.

Usage::

    python -m porepy_tpu.applications.profiling.run_profiling \
        --physics flow --geometry 1 --grid-refinement 0 [--xla-trace DIR]

Geometries: 0 = benchmark 2d case 1, 1 = case 3a, 2 = case 4 (simplex).
Physics: flow | poromechanics (poromechanics wraps the same geometry).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_model(physics: str, geometry: int, refinement: int):
    import porepy_tpu as pt
    from porepy_tpu.examples.flow_benchmark_2d_case_1 import (
        FlowBenchmark2dCase1Model,
        solid_constants_conductive_fractures,
    )
    from porepy_tpu.examples.flow_benchmark_2d_case_3 import (
        FlowBenchmark2dCase3aModel,
    )
    from porepy_tpu.examples.flow_benchmark_2d_case_4 import (
        FlowBenchmark2dCase4Model,
        solid_constants,
    )

    cell_sizes = {
        0: [1 / 16, 1 / 32, 1 / 64],
        1: [0.1, 0.05, 0.025],
        2: [60.0, 30.0, 15.0],
    }
    cs = cell_sizes[geometry][refinement]
    if geometry == 0:
        cls, solids = FlowBenchmark2dCase1Model, solid_constants_conductive_fractures
        grid_type = "cartesian"
    elif geometry == 1:
        cls, solids = FlowBenchmark2dCase3aModel, pt.SolidConstants(
            residual_aperture=1e-4
        )
        grid_type = "simplex"
    else:
        cls, solids = FlowBenchmark2dCase4Model, solid_constants
        grid_type = "simplex"

    params = {
        "grid_type": grid_type,
        "meshing_arguments": {"cell_size": cs},
        "cell_size": cs,
        "material_constants": {"solid": solids},
        "suppress_export": True,
    }
    if physics != "flow":
        raise SystemExit(
            "Only --physics flow is wired; compose a Poromechanics variant "
            "from the same geometry mixins for poroelastic profiling."
        )
    return cls(params), params


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--physics", default="flow")
    parser.add_argument("--geometry", type=int, default=0)
    parser.add_argument("--grid-refinement", type=int, default=0)
    parser.add_argument("--xla-trace", default=None, help="jax.profiler trace dir")
    parser.add_argument(
        "--platform", default=None, help="force a jax platform (e.g. cpu)"
    )
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import porepy_tpu as pt

    model, params = build_model(args.physics, args.geometry, args.grid_refinement)

    t0 = time.perf_counter()
    model.prepare_simulation()
    model._prepared = True
    t_prepare = time.perf_counter() - t0

    if args.xla_trace:
        jax.profiler.start_trace(args.xla_trace)

    iter_times = []
    orig_assemble = model.assemble_linear_system
    orig_solve = model.solve_linear_system

    def assemble():
        t = time.perf_counter()
        orig_assemble()
        iter_times.append(["assemble", time.perf_counter() - t])

    def solve():
        t = time.perf_counter()
        out = orig_solve()
        iter_times.append(["solve", time.perf_counter() - t])
        return out

    model.assemble_linear_system = assemble
    model.solve_linear_system = solve

    t0 = time.perf_counter()
    pt.run_time_dependent_model(model, params)
    t_run = time.perf_counter() - t0

    if args.xla_trace:
        jax.profiler.stop_trace()

    asm = [t for k, t in iter_times if k == "assemble"]
    slv = [t for k, t in iter_times if k == "solve"]
    print(
        json.dumps(
            {
                "physics": args.physics,
                "geometry": args.geometry,
                "refinement": args.grid_refinement,
                "num_dofs": int(model.equation_system.num_dofs()),
                "prepare_s": round(t_prepare, 3),
                "run_s": round(t_run, 3),
                "iterations": len(asm),
                "assembly_ms_median": round(1e3 * float(np.median(asm)), 3) if asm else None,
                "solve_ms_median": round(1e3 * float(np.median(slv)), 3) if slv else None,
            }
        )
    )


if __name__ == "__main__":
    main()
