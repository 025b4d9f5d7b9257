"""Line-search Newton solvers, including the constraint-aware search for
contact mechanics (reference ``numerics/nonlinear/line_search.py``, the
algorithm of arXiv:2407.01184).

Three composable pieces:
- :class:`LineSearchNewtonSolver`: residual-norm backtracking along the
  Newton direction (enabled by ``params["global_line_search"]``).
- :class:`SplineInterpolationLineSearch`: root/minimum bracketing of
  constraint functions by monotone spline interpolation.
- :class:`ConstraintLineSearch`: scales the update so contact states
  (open/closed, sticking/sliding) do not jump across the complementarity
  boundaries in one iteration (enabled by ``params["local_line_search"]``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import scipy.interpolate

from porepy_tpu.numerics.nonlinear.nonlinear_solvers import NewtonSolver

__all__ = [
    "LineSearchNewtonSolver",
    "SplineInterpolationLineSearch",
    "ConstraintLineSearch",
]


class LineSearchNewtonSolver(NewtonSolver):
    """Newton with a (global) residual line search along the update."""

    @property
    def min_line_search_weight(self) -> float:
        return self.params.get("min_line_search_weight", 1e-10)

    def iteration(self, model) -> np.ndarray:
        dx = super().iteration(model)
        relaxation = self.nonlinear_line_search(model, dx)
        sol = relaxation * dx
        model._current_update = sol
        return sol

    def nonlinear_line_search(self, model, dx: np.ndarray) -> np.ndarray:
        return self.residual_line_search(model, dx)

    def residual_line_search(self, model, dx: np.ndarray) -> np.ndarray:
        if not self.params.get("global_line_search", False):
            return np.ones_like(dx)

        def objective_function(weight):
            return self.residual_objective_function(model, dx, weight)

        interval_size = self.params.get(
            "residual_line_search_interval_size", 1e-1
        )
        f_0 = objective_function(0)
        f_1 = objective_function(1)
        if f_1 / np.linalg.norm(dx.size) < self.params.get(
            "nl_convergence_tol_res", 1e-10
        ):
            return np.ones_like(dx)

        def f_terminate(vals):
            return vals[-1] > vals[-2]

        num_steps = int(self.params.get("residual_line_search_num_steps", 5))
        alpha = self.recursive_weight_from_sampling(
            0,
            1,
            f_terminate,
            objective_function,
            num_steps=num_steps,
            step_size_tolerance=interval_size,
            f_a=f_0,
            f_b=f_1,
        )
        return np.maximum(alpha, self.min_line_search_weight) * np.ones_like(dx)

    def recursive_weight_from_sampling(
        self,
        a: float,
        b: float,
        condition_function: Callable[[Sequence], bool],
        function: Callable,
        num_steps: int,
        step_size_tolerance: float,
        f_a=None,
        f_b=None,
    ) -> float:
        """Sample ``function`` on [a, b]; recurse into the first interval
        where ``condition_function`` triggers, until the interval is small.
        Returns the largest sampled point before the trigger."""
        x_l = a
        f_l = function(a) if f_a is None else f_a
        sampling_points = np.linspace(a, b, num_steps)
        step_size = (b - a) / (num_steps - 1)
        f_vals = [f_l]
        for x_h in sampling_points[1:]:
            f_h = (
                f_b
                if (f_b is not None and np.isclose(x_h, b))
                else function(x_h)
            )
            f_vals.append(f_h)
            if condition_function(f_vals):
                if step_size > step_size_tolerance:
                    return self.recursive_weight_from_sampling(
                        x_l,
                        x_h,
                        condition_function,
                        function,
                        num_steps,
                        step_size_tolerance,
                        f_a=f_l,
                        f_b=f_h,
                    )
                return x_l if x_l > a else (x_l + x_h) / 2
            f_l, x_l = f_h, x_h
        return b

    def residual_objective_function(
        self, model, dx: np.ndarray, weight: float
    ) -> float:
        x_0 = model.equation_system.get_variable_values(iterate_index=0)
        model.equation_system.set_variable_values(
            x_0 + weight * dx, iterate_index=0
        )
        try:
            residual = model.equation_system.assemble(evaluate_jacobian=False)
        finally:
            model.equation_system.set_variable_values(x_0, iterate_index=0)
        return float(np.linalg.norm(residual))


class SplineInterpolationLineSearch:
    """Constraint-weight computation by monotone (PCHIP) spline roots."""

    def compute_constraint_weights(
        self,
        model,
        solution_update: np.ndarray,
        constraint_function,
        crossing_inds: np.ndarray,
        f_0: np.ndarray,
        interval_target_size: float,
        max_weight: Optional[float] = 1.0,
    ) -> float:
        if not np.any(crossing_inds):
            return 1.0
        a, b = 0.0, float(max_weight)
        x_0 = model.equation_system.get_variable_values(iterate_index=0)
        f_0 = f_0[crossing_inds]
        f_1 = np.asarray(
            model.equation_system.evaluate(
                constraint_function, state=x_0 + solution_update * b
            )
        )[crossing_inds]

        def f(x):
            return np.asarray(
                model.equation_system.evaluate(
                    constraint_function, state=x_0 + solution_update * x
                )
            )[crossing_inds]

        alpha, _, _ = self.recursive_spline_interpolation(
            a,
            b,
            f,
            num_pts=5,
            interval_target_size=interval_target_size,
            f_a=f_0,
            f_b=f_1,
        )
        return alpha

    def recursive_spline_interpolation(
        self,
        a: float,
        b: float,
        function: Callable,
        num_pts: int,
        interval_target_size: float,
        f_a=None,
        f_b=None,
    ) -> tuple[float, float, float]:
        counter = 0
        alpha = b
        while b - a > interval_target_size or counter < 1:
            alpha, x, _ = self.optimum_from_spline(
                function, a, b, num_pts, f_a=f_a, f_b=f_b
            )
            x = np.linspace(a, b, num_pts)
            ind = int(np.searchsorted(x, alpha))
            if ind == num_pts:
                ind -= 1
            if ind == 0:
                ind += 1
            a, b = x[ind - 1], x[ind]
            f_a = f_b = None
            counter += 1
            if counter > 20:
                break
        return alpha, a, b

    def optimum_from_spline(
        self, f: Callable, a: float, b: float, num_pts: int, f_a=None, f_b=None
    ) -> tuple[float, np.ndarray, np.ndarray]:
        x = np.linspace(a, b, num_pts)
        y_list = []
        for pt in x:
            if f_a is not None and np.isclose(pt, a):
                f_pt = f_a
            elif f_b is not None and np.isclose(pt, b):
                f_pt = f_b
            else:
                f_pt = f(pt)
            if np.any(np.isnan(f_pt)):
                x = x[: np.where(x == pt)[0][0]]
                break
            y_list.append(f_pt)
        y = (
            np.vstack(y_list)
            if isinstance(y_list[0], np.ndarray)
            else np.array(y_list)
        )

        def minimum_from_spline(poly) -> float:
            roots = poly.roots()
            if roots.size == 0:
                return b
            roots = roots[(roots >= a) & (roots <= b)]
            return float(np.min(roots)) if roots.size else b

        if isinstance(y_list[0], np.ndarray):
            minima = [
                minimum_from_spline(
                    scipy.interpolate.PchipInterpolator(x, y[:, i])
                )
                for i in range(y.shape[1])
            ]
            alpha = float(np.min(minima))
        else:
            alpha = minimum_from_spline(
                scipy.interpolate.PchipInterpolator(x, y)
            )
        return alpha, x, y


class ConstraintLineSearch:
    """Keep contact-state indicator functions (``opening_indicator``,
    ``sliding_indicator`` model methods) from overshooting their zero
    crossings in a single Newton update."""

    def nonlinear_line_search(self, model, dx: np.ndarray) -> np.ndarray:
        residual_weight = self.residual_line_search(model, dx)
        if self.params.get("local_line_search", False):
            return self.constraint_line_search(
                model, dx, residual_weight.min()
            )
        return residual_weight

    def constraint_line_search(
        self, model, dx: np.ndarray, max_weight: float
    ) -> np.ndarray:
        subdomains = model.mdg.subdomains(dim=model.nd - 1)
        global_weight = max_weight
        for sd in subdomains:
            sd_list = [sd]
            normal_weights = self.constraint_weights(
                model,
                dx,
                model.opening_indicator(sd_list),
                max_weight=max_weight,
            )
            tangential_weights = self.constraint_weights(
                model,
                dx,
                model.sliding_indicator(sd_list),
                max_weight=np.minimum(max_weight, normal_weights).min(),
            )
            min_weights = np.minimum(tangential_weights, normal_weights)
            model.mdg.subdomain_data(sd)["constraint_weights"] = min_weights
            global_weight = np.minimum(global_weight, min_weights.min())
        return np.ones_like(dx) * global_weight

    def constraint_weights(
        self,
        model,
        solution_update: np.ndarray,
        constraint_function,
        max_weight: float,
    ) -> np.ndarray:
        from porepy_tpu.numerics.ad.operators import (
            wrap_as_dense_ad_array,
        )

        x_0 = model.equation_system.get_variable_values(iterate_index=0)
        violation_tol = self.params.get("constraint_violation_tolerance", 3e-1)
        relative_cell_tol = self.params.get(
            "relative_constraint_transition_tolerance", 2e-1
        )
        f_1 = np.asarray(
            model.equation_system.evaluate(
                constraint_function, state=x_0 + max_weight * solution_update
            )
        )
        weight = max_weight
        weights = max_weight * np.ones(f_1.shape)
        f_0 = np.asarray(
            model.equation_system.evaluate(constraint_function, state=x_0)
        )
        active_inds = np.ones(f_1.shape, dtype=bool)
        for i in range(10):
            violation = violation_tol * np.sign(f_1)
            f = constraint_function - wrap_as_dense_ad_array(violation)
            roundoff = 1e-8
            inds = (np.abs(f_1) > violation_tol) & (f_0 * f_1 < -roundoff)
            if i > 0 and np.sum(active_inds) < max(
                1, relative_cell_tol * active_inds.size
            ):
                break
            f_0_v = f_0 - violation
            crossing_weight = self.compute_constraint_weights(
                model,
                solution_update,
                f,
                inds,
                f_0_v,
                interval_target_size=1e-3,
                max_weight=max_weight,
            )
            weight = np.clip(
                crossing_weight,
                a_max=max_weight,
                a_min=self.min_line_search_weight,
            )
            weights[inds] = weight
            f_1 = np.asarray(
                model.equation_system.evaluate(
                    constraint_function,
                    state=x_0 + weight * solution_update,
                )
            )
            active_inds = (np.abs(f_1) > violation_tol) & (
                f_0 * f_1 < -roundoff
            )
            max_weight = weight
            violation_tol = violation_tol / 2
        return weights
