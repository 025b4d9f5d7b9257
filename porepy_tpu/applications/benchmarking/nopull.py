"""No-pull fused-block timing: measure the real framework compute path on
an accelerator whose device->host fetch path is degraded.

The tunneled TPU in this environment has a measured, intermittent failure
mode where dispatch, execution and ``jax.block_until_ready`` all work
(timing via ``block_until_ready`` was validated to scale linearly with
enqueued FLOPs — it is a true completion barrier) but EVERY device->host
transfer, even 8 bytes, blocks for minutes. The standard run loop pulls
state between fused blocks, so it cannot produce numbers in that state.

This module times the exact production compute artifact — the jitted
fused time block built by
:meth:`SolutionStrategy._build_fused_time_block` (``lax.scan`` over time
steps, each a whole-Newton ``lax.while_loop`` of compiled assembly +
preconditioned FGMRES + convergence test) — without ever fetching device
data:

  - the per-step *eligibility observation* (which pulls) is replaced by
    force-enabling the substitution map; a CPU-backend twin of the same
    case runs with ``pull_stats=True`` to validate eligibility, pull the
    Newton/Krylov iteration counts and check convergence flags;
  - the preconditioner build is already host-only
    (:meth:`_refresh_preconditioner_host` assembles on the CPU backend);
  - timing is wall clock around ``block_until_ready`` on warm dispatches.

Per-Newton-iteration wall = block wall / (iterations in the block), with
the iteration count taken from the CPU twin (same math, same algorithm;
the twin also reports per-step convergence so a divergent configuration
is caught there, not silently mistimed).

Reference measurement being compared against: per-iteration scipy
assembly + spsolve, reference ``src/porepy/models/solution_strategy.py``
(see tools/ref_baselines.json).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

__all__ = ["fused_block_timer"]


def _noop(**kw) -> None:
    pass


def _or_none(v):
    """NaN -> None (the residual is NaN when the convergence test is
    increment-only and the block never evaluates it); keeps JSON RFC-clean."""
    import math

    return None if isinstance(v, float) and not math.isfinite(v) else v


def fused_block_timer(
    model,
    params: dict,
    *,
    repeats: int = 5,
    measure_budget_s: Optional[float] = None,
    pull_stats: bool = False,
    emit: Optional[Callable[..., None]] = None,
) -> dict:
    """Prepare ``model``, force-enable the fused time block, and time warm
    dispatches (up to ``repeats``; stop early once ``measure_budget_s`` of
    measurement wall has accumulated — heavy cases keep their deadline
    budget for the phases that need it). ``pull_stats=True`` (safe on the
    CPU backend) additionally fetches per-step Newton/Krylov counts and
    convergence flags."""
    import jax
    import jax.numpy as jnp

    from porepy_tpu.utils import device_policy

    emit = emit or _noop
    out: dict = {"backend": jax.default_backend()}

    t0 = time.perf_counter()
    model.prepare_simulation()
    out["prepare_s"] = round(time.perf_counter() - t0, 3)
    emit(phase="prepare", s=out["prepare_s"])
    model.before_nonlinear_loop()

    eq = model.equation_system
    out["num_dofs"] = int(eq.num_dofs())
    cs = eq.compiled_system()
    for ce in cs.ces:
        if ce.env_spec.last_refreshed is None:
            ce.env_spec.last_refreshed = ()
    subst = model._fused_block_substitution(cs)
    if subst is None:
        out["error"] = "fused-block substitution ineligible"
        return out
    solver = model._device_solver_for(cs)
    if solver._m_state is None:
        t0 = time.perf_counter()
        model._refresh_preconditioner_host(cs, solver)
        out["precond_s"] = round(time.perf_counter() - t0, 3)
        emit(phase="precond", s=out["precond_s"])

    nl = {
        "max_iterations": int(params.get("max_iterations", 10)),
        "nl_convergence_tol": params.get("nl_convergence_tol", 1e-10),
        "nl_convergence_tol_res": params.get(
            "nl_convergence_tol_res", np.inf
        ),
        "nl_divergence_tol": params.get("nl_divergence_tol", np.inf),
    }
    chunk = max(min(int(params.get("fused_time_steps", 8)), 512), 2)

    t0 = time.perf_counter()
    fn = model._build_fused_time_block(cs, solver, nl, subst, chunk)
    envs = cs._envs(eq)
    x0 = device_policy.put(eq._global_vector())
    na = jnp.asarray(chunk, jnp.int32)
    res = fn(x0, envs, solver._m_state, na)
    jax.block_until_ready(res)
    out["compile_s"] = round(time.perf_counter() - t0, 3)
    emit(phase="compile", s=out["compile_s"])

    times = []
    measured = 0.0
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x0, envs, solver._m_state, na))
        dt = time.perf_counter() - t0
        times.append(dt)
        measured += dt
        emit(phase="block", wall_s=round(dt, 3), steps=chunk)
        if measure_budget_s is not None and measured >= measure_budget_s:
            break
    wall = float(np.median(times))
    out.update(
        mode="fused_block(nopull)",
        steps_per_block=chunk,
        blocks_measured=len(times),
        block_ms=round(wall * 1000.0, 3),
        per_step_ms=round(wall * 1000.0 / chunk, 3),
    )

    if pull_stats:
        _x_stack, k_arr, _inc, res_st, kry_st, ok_arr = res
        k_np = np.asarray(k_arr)
        ok_np = np.asarray(ok_arr)
        kry_np = np.asarray(kry_st)
        res_np = np.asarray(res_st)
        n_ok = int(ok_np.sum())
        iters = int(k_np[:n_ok].sum()) if n_ok else 0
        out.update(
            steps_converged=n_ok,
            newton_iters_per_block=iters,
            newton_iters_per_step=[int(k) for k in k_np[:n_ok]],
            krylov_iters_per_block=int(
                sum(
                    kry_np[j, : max(int(k_np[j]), 1)].sum()
                    for j in range(n_ok)
                )
            ),
            last_residual=_or_none(
                float(res_np[n_ok - 1, max(int(k_np[n_ok - 1]) - 1, 0)])
                if n_ok
                else None
            ),
        )
        if iters:
            out["total_ms"] = round(wall * 1000.0 / iters, 3)
        emit(
            phase="stats",
            steps_converged=n_ok,
            newton_iters=iters,
            krylov_iters=out.get("krylov_iters_per_block"),
        )
    return out
