"""Profile the md-flow benchmark case component-by-component on device.

Times, per Newton iteration: assembly (data+rhs), one matvec, one
preconditioner apply, and the full FGMRES solve with real iteration
counts. Run on TPU (default) or CPU (--platform cpu).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def timeit(fn, *args, reps=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None)
    parser.add_argument("--case", default="md", choices=["md", "biot", "3d"])
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    import porepy_tpu as pt
    from porepy_tpu.applications.benchmarking import cases as bench_cases

    base = {"md": pt.SinglePhaseFlow, "biot": pt.Poromechanics}[
        args.case if args.case != "3d" else "md"
    ]

    # Rebuild the bench model but stop after setup + one assembly.
    if args.case == "md":
        class Model(pt.SinglePhaseFlow):
            def set_fractures(self):
                self._fractures = [
                    pt.LineFracture(f) for f in bench_cases.FRACTURES_2D
                ]

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
            "time_manager": pt.TimeManager([0, 1.0], 1.0, constant_dt=True),
            "linear_solver": "device_gmres",
        }
        m = Model(params)
    else:
        raise SystemExit("only md wired so far")

    m.prepare_simulation()
    m.time_manager.increase_time()
    m.time_manager.increase_time_index()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()

    eq_sys = m.equation_system
    cs = eq_sys.compiled_system()
    solver = m._device_solver_for(cs)
    envs = cs._envs(eq_sys)
    x0 = jnp.asarray(eq_sys._global_vector())

    f_assemble = jax.jit(lambda x, envs: cs._data_and_rhs(x, envs))
    data, b = f_assemble(x0, envs)
    jax.block_until_ready(data)
    if solver._m_state is None:
        t0 = time.perf_counter()
        solver.refresh_preconditioner(data)
        print(f"precond build: {time.perf_counter() - t0:.3f}s")
    ms = solver._m_state

    t_asm = timeit(f_assemble, x0, envs)
    print(f"assembly (data+rhs): {t_asm * 1e3:.3f} ms")

    t_res = timeit(jax.jit(lambda x, envs: cs._rhs_only(x, envs)), x0, envs)
    print(f"rhs only:            {t_res * 1e3:.3f} ms")

    ell_sel, ell_col = solver.solve_args

    @jax.jit
    def mv(data, x):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        val = data_p[ell_sel]
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(val * x_p[ell_col], axis=1)

    t_mv = timeit(mv, data, jnp.asarray(b), reps=50)
    print(f"one ELL matvec:      {t_mv * 1e3:.3f} ms  (nnz={cs.indices_np.shape[0]})")

    f_apply = jax.jit(lambda ms, r: solver._m_apply(ms, r))
    t_ap = timeit(f_apply, ms, jnp.asarray(b), reps=50)
    print(f"one precond apply:   {t_ap * 1e3:.3f} ms")

    for tol in (1e-2, 1e-6, 1e-11):
        t0 = time.perf_counter()
        x, res, iters = solver._jit_solve(
            data, jnp.asarray(b), jnp.zeros_like(jnp.asarray(b)), ms,
            jnp.asarray(tol),
        )
        jax.block_until_ready(x)
        t_first = time.perf_counter() - t0
        t_sol = timeit(
            lambda d, bb: solver._jit_solve(
                d, bb, jnp.zeros_like(bb), ms, jnp.asarray(tol)
            )[0],
            data,
            jnp.asarray(b),
            reps=5,
        )
        print(
            f"solve tol={tol:g}: {t_sol * 1e3:8.3f} ms, iters={int(iters)}, "
            f"res={float(res):.2e} (first call {t_first:.2f}s)"
        )

    n = solver.n
    print(f"n={n}, restart={solver._restart}, maxiter={solver.maxiter}")


if __name__ == "__main__":
    main()
