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


def _export_path(export_key: str) -> str:
    import os

    import jax

    base = os.environ.get(
        "PPT_BENCH_EXPORT_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ))),
            ".jax_cache",
            "exports",
        ),
    )
    return os.path.join(base, f"{export_key}_{jax.default_backend()}.jaxexp")


def _aot_call(fn, args, export_key, emit):
    """Return ``(call, src)``: a callable taking the args pytree.

    With ``export_key``, tries a serialized ``jax.export`` artifact first —
    deserializing skips the Python re-trace of the block (measured 1350 s
    for the thermoporomechanics case; the XLA backend compile below it is
    covered by the persistent compilation cache). A missing/stale artifact
    falls back to the live jit and re-exports for next time. Artifacts are
    machine-local (.jax_cache/exports/, untracked, like the compile cache);
    results were verified bitwise-identical to the live jit path."""
    import os

    import jax

    if not export_key:
        return (lambda a: fn(*a)), "jit"
    path = _export_path(export_key)
    flat, treedef = jax.tree.flatten(args)
    if os.path.exists(path):
        try:
            exp = jax.export.deserialize(open(path, "rb").read())
            # Stale-artifact guard: the arg pytree (m_state structure,
            # shapes, dtypes) must match what was exported — e.g. a
            # preconditioner-policy change alters the leaf count.
            if len(exp.in_avals) != len(flat):
                raise ValueError(
                    f"arg leaf count {len(flat)} != exported "
                    f"{len(exp.in_avals)}"
                )
            for av, leaf in zip(exp.in_avals, flat):
                la = jax.api_util.shaped_abstractify(leaf)
                if av.shape != la.shape or av.dtype != la.dtype:
                    raise ValueError(
                        f"arg aval {la.str_short()} != exported "
                        f"{av.str_short()}"
                    )

            def call(a):
                return exp.call(*jax.tree.flatten(a)[0])

            return call, "export"
        except Exception as exc:  # stale/incompatible artifact
            emit(phase="export_fallback", error=f"{type(exc).__name__}: {exc}")

    def flat_fn(*leaves):
        return fn(*jax.tree.unflatten(treedef, leaves))

    try:
        exp = jax.export.export(jax.jit(flat_fn))(*flat)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(exp.serialize())

        def call(a):
            return exp.call(*jax.tree.flatten(a)[0])

        return call, "jit+export"
    except Exception as exc:
        emit(phase="export_skip", error=f"{type(exc).__name__}: {exc}")
        return (lambda a: fn(*a)), "jit"


def fused_block_timer(
    model,
    params: dict,
    *,
    repeats: int = 5,
    measure_budget_s: Optional[float] = None,
    pull_stats: bool = False,
    export_key: Optional[str] = None,
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
    args = (x0, envs, solver._m_state, na)
    call, src = _aot_call(fn, args, export_key, emit)
    res = call(args)
    jax.block_until_ready(res)
    out["compile_s"] = round(time.perf_counter() - t0, 3)
    out["compile_src"] = src
    emit(phase="compile", s=out["compile_s"], src=src)

    early_stats = pull_stats and jax.default_backend() == "cpu"
    if early_stats:
        # Pull stats from the WARMUP dispatch immediately: on heavy cases a
        # deadline/watchdog kill during the timing loop must not lose the
        # iteration counts (they are the whole point of the CPU twin). On
        # an accelerator the pull waits until AFTER the timing loop — a
        # device->host transfer can degrade every later dispatch (see
        # module docstring), which would poison the measurement itself.
        _stats_from(res, out, chunk, emit)

    # Timed blocks CHAIN: each dispatch consumes the previous block's last
    # committed state, exactly like production time stepping. Independent
    # repeats of the same dispatch were measured to overlap on the device
    # (20 "repeats" of a 57 ms block completed in 68 ms total), which
    # silently understates per-block wall ~20x; the chain's data
    # dependency serializes them and charges the real per-dispatch cost.
    # Blocks 2+ run the STEADY trajectory (every step converges in the
    # tail iteration count), which is what long runs are made of.
    times = []
    measured = 0.0
    x_cur = x0
    for i in range(repeats):
        t0 = time.perf_counter()
        res_i = call((x_cur, envs, solver._m_state, na))
        x_cur = res_i[0][chunk - 1]
        jax.block_until_ready(x_cur)
        dt = time.perf_counter() - t0
        times.append(dt)
        measured += dt
        emit(phase="block", wall_s=round(dt, 3), steps=chunk)
        if measure_budget_s is not None and measured >= measure_budget_s:
            break
    wall = float(np.median(times))
    out.update(
        mode="fused_block(nopull,chained)",
        steps_per_block=chunk,
        blocks_measured=len(times),
        block_ms=round(wall * 1000.0, 3),
        per_step_ms=round(wall * 1000.0 / chunk, 3),
    )

    if pull_stats:
        if not early_stats:
            _stats_from(res, out, chunk, emit)
        # Steady-state accounting for the chained blocks: every step in
        # blocks 2+ converges in the tail iteration count of the first
        # block (verified via steady_steps_converged below).
        _stats_from(res_i, out, chunk, emit, prefix="steady_")
        steady = out.get("steady_newton_iters_per_block")
        if steady:
            out["total_ms"] = round(wall * 1000.0 / steady, 3)
        elif out.get("newton_iters_per_block"):
            out["total_ms"] = round(
                wall * 1000.0 / out["newton_iters_per_block"], 3
            )
    return out


def _stats_from(res, out: dict, chunk: int, emit, prefix: str = "") -> None:
    _x_stack, k_arr, _inc, res_st, kry_st, ok_arr = res
    k_np = np.asarray(k_arr)
    ok_np = np.asarray(ok_arr)
    kry_np = np.asarray(kry_st)
    res_np = np.asarray(res_st)
    n_ok = int(ok_np.sum())
    iters = int(k_np[:n_ok].sum()) if n_ok else 0
    out.update(
        {
            "steps_per_block": chunk,
            f"{prefix}steps_converged": n_ok,
            f"{prefix}newton_iters_per_block": iters,
            f"{prefix}newton_iters_per_step": [int(k) for k in k_np[:n_ok]],
            f"{prefix}krylov_iters_per_block": int(
                sum(
                    kry_np[j, : max(int(k_np[j]), 1)].sum()
                    for j in range(n_ok)
                )
            ),
            f"{prefix}last_residual": _or_none(
                float(res_np[n_ok - 1, max(int(k_np[n_ok - 1]) - 1, 0)])
                if n_ok
                else None
            ),
        }
    )
    emit(
        **{
            "phase": f"{prefix}stats",
            "steps_converged": n_ok,
            f"{prefix}newton_iters_per_block": iters,
            f"{prefix}krylov_iters_per_block": out.get(
                f"{prefix}krylov_iters_per_block"
            ),
        }
    )
