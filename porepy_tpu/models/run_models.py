"""Simulation run loops (reference ``models/run_models.py:21,49``)."""

from __future__ import annotations

import logging
from typing import Optional

from porepy_tpu.numerics.linear_solvers import LinearSolver
from porepy_tpu.numerics.nonlinear.nonlinear_solvers import NewtonSolver

__all__ = ["run_stationary_model", "run_time_dependent_model"]

logger = logging.getLogger(__name__)


def _choose_solver(model, params: dict):
    if "nonlinear_solver" in params:
        return params["nonlinear_solver"](params)
    if model._is_nonlinear_problem():
        return NewtonSolver(params)
    return LinearSolver(params)


def run_stationary_model(model, params: Optional[dict] = None) -> None:
    params = params or model.params
    model.prepare_simulation()
    solver = _choose_solver(model, params)
    solver.solve(model)
    model.after_simulation()


def run_time_dependent_model(model, params: Optional[dict] = None) -> None:
    params = params or model.params
    if not getattr(model, "_prepared", False):
        model.prepare_simulation()
        model._prepared = True
    solver = _choose_solver(model, params)

    tm = model.time_manager
    while not tm.final_time_reached():
        tm.increase_time()
        tm.increase_time_index()
        logger.info(f"Time step {tm.time_index} at time {tm.time:.6e}, dt {tm.dt:.6e}")
        solver.solve(model)
        model.nonlinear_solver_statistics.log_timestep(tm.time_index, tm.time)
    model.after_simulation()
