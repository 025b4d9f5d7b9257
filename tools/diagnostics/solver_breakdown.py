"""Breakdown of the device solve on the md bench config: iteration counts,
per-matvec and per-preconditioner-apply wall, and the solve total — the
numbers that decide whether the Krylov loop is iteration-bound or
per-op-overhead-bound.

Usage: python tools/diagnostics/solver_breakdown.py [--case md|biot|3d]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def build_md():
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

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 128},
        "material_constants": {
            "solid": pt.SolidConstants(
                permeability=1.0, porosity=0.1,
                residual_aperture=0.01, normal_permeability=1.0,
            ),
            "fluid": pt.FluidComponent(
                compressibility=1e-6, viscosity=1e-3, density=1000.0
            ),
        },
        "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    return m


def build_biot():
    import porepy_tpu as pt

    class Model(pt.Poromechanics):
        def bc_values_displacement(self, bg):
            vals = np.zeros((self.nd, bg.num_cells))
            north = self.domain_boundary_sides(bg).north
            vals[1, north] = -0.001
            return vals.ravel("F")

        def bc_values_pressure(self, bg):
            return np.zeros(bg.num_cells)

        def initialize_data_saving(self):
            pass

        def save_data_time_step(self):
            pass

    params = {
        "grid_type": "cartesian",
        "meshing_arguments": {"cell_size": 1.0 / 64},
        "material_constants": {
            "solid": pt.SolidConstants(
                shear_modulus=1.0, lame_lambda=1.0, permeability=1e-2,
                porosity=0.1, biot_coefficient=0.8, specific_storage=0.1,
            ),
            "fluid": pt.FluidComponent(
                viscosity=1.0, density=1.0, compressibility=1e-2
            ),
        },
        "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    m.prepare_simulation()
    m.before_nonlinear_loop()
    m.before_nonlinear_iteration()
    return m


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default="md", choices=["md", "biot"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    m = {"md": build_md, "biot": build_biot}[args.case]()
    eq = m.equation_system
    cs = eq.compiled_system()
    solver = m._device_solver_for(cs)
    data, b, _ = eq.assemble_device()
    data = jnp.asarray(data)
    b = jnp.asarray(b)
    solver.refresh_preconditioner(data)

    n = solver.n
    print(f"n={n} nnz={cs.indices_np.shape[0]} K(ell)={solver._ell_sel.shape[1]}")

    # one matvec
    ell_sel, ell_col = solver._ell_sel, solver._ell_col
    data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    val = (data_p[ell_sel]).astype(jnp.float32)

    @jax.jit
    def mv(x):
        x_p = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        return jnp.sum(val * x_p[ell_col], axis=1)

    x32 = jnp.ones(n, jnp.float32)
    jax.block_until_ready(mv(x32))
    t0 = time.perf_counter()
    for _ in range(50):
        x32 = mv(x32)
    jax.block_until_ready(x32)
    t_mv = (time.perf_counter() - t0) / 50
    print(f"matvec: {t_mv*1e6:.0f} us")

    # one preconditioner apply
    M = jax.jit(lambda r: solver._m_apply(solver._m_state, r))
    r = jnp.ones(n, jnp.float32)
    jax.block_until_ready(M(r))
    t0 = time.perf_counter()
    y = r
    for _ in range(20):
        y = M(y)
    jax.block_until_ready(y)
    t_M = (time.perf_counter() - t0) / 20
    print(f"precond apply: {t_M*1e6:.0f} us")

    # full solve at a few tolerances
    for tol in (1e-2, 1e-4, 1e-8, 1e-11):
        x = jnp.zeros(n, b.dtype)
        bn = float(jnp.linalg.norm(b))
        t0 = time.perf_counter()
        x, res, iters = solver._jit_solve(
            data, b / bn, x, solver._m_state, jnp.asarray(tol)
        )
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        # warm second run
        x = jnp.zeros(n, b.dtype)
        t0 = time.perf_counter()
        x, res, iters = solver._jit_solve(
            data, b / bn, x, solver._m_state, jnp.asarray(tol)
        )
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        print(
            f"tol={tol:.0e}: iters={int(iters)} res={float(res):.2e} "
            f"wall={dt*1e3:.1f} ms  ({dt/max(int(iters),1)*1e6:.0f} us/iter)"
        )

    # AMG hierarchy shape
    for i, h in (solver._hierarchies or {}).items():
        try:
            sizes = [lvl for lvl in h.level_sizes]
        except AttributeError:
            sizes = "n/a"
        print(f"amg block {i}: level sizes {sizes}")


if __name__ == "__main__":
    main()
