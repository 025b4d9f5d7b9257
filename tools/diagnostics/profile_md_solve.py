"""Profile the md-flow bench case solve: Krylov iteration counts, per-matvec
and per-V-cycle wall, and end-to-end solve wall — to locate whether the
mdflow_mpfa_2d_128 regression (303 ms vs scipy's 192 ms) is iteration count
or per-iteration cost. Run on the real TPU."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp

import porepy_tpu as pt

FRACTURES_2D = [
    np.array([[0.125, 0.875], [0.25, 0.25]]),
    np.array([[0.125, 0.875], [0.5, 0.5]]),
    np.array([[0.125, 0.875], [0.75, 0.75]]),
    np.array([[0.25, 0.25], [0.125, 0.875]]),
    np.array([[0.5, 0.5], [0.125, 0.875]]),
    np.array([[0.75, 0.75], [0.125, 0.875]]),
]


class Model(pt.SinglePhaseFlow):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]

    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[1]

    def initialize_data_saving(self):
        pass

    def save_data_time_step(self):
        pass


def main():
    cell_size = float(os.environ.get("PROF_CELL_SIZE", 1.0 / 128))
    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": cell_size},
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
        "time_manager": pt.TimeManager([0, 3.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
        "fused_newton": False,
    }
    m = Model(params)
    m.prepare_simulation()
    m.time_manager.increase_time()
    m.time_manager.increase_time_index()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    m.assemble_linear_system()
    data, b, cs = m._device_assembly
    solver = m._device_solver_for(cs)
    print(f"n={solver.n} nnz={cs.indices_np.shape[0]}")

    # Build preconditioner (host) -- time it.
    t0 = time.perf_counter()
    solver.refresh_preconditioner(data)
    print(f"precond build: {time.perf_counter() - t0:.3f}s")

    b = jnp.asarray(b)
    bn = float(jnp.linalg.norm(b))
    b_unit = b / bn

    # Full solve at various tolerances.
    for tol in (1e-4, 1e-7, 1e-11):
        x, res, iters = solver._jit_solve(
            data, b_unit, jnp.zeros(solver.n, b.dtype), solver._m_state,
            jnp.asarray(tol),
        )
        jax.block_until_ready(x)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            x, res, iters = solver._jit_solve(
                data, b_unit, jnp.zeros(solver.n, b.dtype), solver._m_state,
                jnp.asarray(tol),
            )
            jax.block_until_ready(x)
            reps.append(time.perf_counter() - t0)
        print(
            f"tol={tol:.0e}: solve {np.median(reps)*1e3:8.2f} ms  "
            f"iters={int(iters)}  res={float(res):.2e}"
        )

    # Micro: one ELL matvec (f32), one precond apply.
    data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    val = data_p[solver._ell_sel].astype(jnp.float32)
    col = solver._ell_col
    xx = jnp.ones(solver.n, jnp.float32)

    @jax.jit
    def mv(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(val * x_p[col], axis=1)

    jax.block_until_ready(mv(xx))
    t0 = time.perf_counter()
    for _ in range(100):
        xx = mv(xx)
    jax.block_until_ready(xx)
    print(f"ELL matvec (f32, dispatched): {(time.perf_counter()-t0)/100*1e6:.1f} us")

    @jax.jit
    def mv_chain(x):
        def body(_, x):
            return mv(x) * 1e-3
        return jax.lax.fori_loop(0, 100, body, x)

    xx = jnp.ones(solver.n, jnp.float32)
    jax.block_until_ready(mv_chain(xx))
    t0 = time.perf_counter()
    jax.block_until_ready(mv_chain(xx))
    print(f"ELL matvec (fused chain): {(time.perf_counter()-t0)/100*1e6:.1f} us")

    apply = jax.jit(lambda st, r: solver._m_apply(st, r))
    r = jnp.ones(solver.n, jnp.float32)
    jax.block_until_ready(apply(solver._m_state, r))
    t0 = time.perf_counter()
    for _ in range(20):
        y = apply(solver._m_state, r)
    jax.block_until_ready(y)
    print(f"precond apply: {(time.perf_counter()-t0)/20*1e3:.3f} ms")

    # Krylov-iteration histogram via per-cycle run: call _fgmres manually?
    # Use last_stats path: solver.solve with stats.
    xs = solver.solve(data, np.asarray(b))
    print("last_stats:", solver.last_stats)


if __name__ == "__main__":
    main()
