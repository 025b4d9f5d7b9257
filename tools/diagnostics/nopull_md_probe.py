"""Manual probe: time the fused md-flow time block on the TPU WITHOUT any
device->host pull (the tunnel's d2h path wedges intermittently; execution
and ``block_until_ready`` are unaffected — measured 2026-08-20).

Forces the fused-block substitution map without the two per-step
observation steps (those pull), then times warm dispatches of the real
compiled block. Run with JAX_PLATFORMS unset (TPU) or =cpu for the twin.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    _plat = os.environ["JAX_PLATFORMS"]
    if "cpu" not in [p.strip() for p in _plat.split(",")]:
        _plat += ",cpu"
    jax.config.update("jax_platforms", _plat)

import numpy as np

sys.path.insert(0, "/root/repo")

import faulthandler

faulthandler.dump_traceback_later(560, exit=True)

import jax
import jax.numpy as jnp

import porepy_tpu as pt
from porepy_tpu.utils import device_policy

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


def main(cell_size=1.0 / 128, chunk=8):
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
        "time_manager": pt.TimeManager([0, 26.0], 1.0, constant_dt=True),
        "linear_solver": "device_gmres",
    }
    m = Model(params)
    t0 = time.perf_counter()
    m.prepare_simulation()
    print(f"prepare_s {time.perf_counter()-t0:.2f}", flush=True)
    m.before_nonlinear_loop()

    eq = m.equation_system
    cs = eq.compiled_system()
    for ce in cs.ces:
        if ce.env_spec.last_refreshed is None:
            ce.env_spec.last_refreshed = ()
    subst = m._fused_block_substitution(cs)
    assert subst is not None, "substitution ineligible"
    solver = m._device_solver_for(cs)
    if solver._m_state is None:
        t0 = time.perf_counter()
        m._refresh_preconditioner_host(cs, solver)
        print(f"precond_s {time.perf_counter()-t0:.2f}", flush=True)
    nl = {
        "max_iterations": 10,
        "nl_convergence_tol": 1e-10,
        "nl_convergence_tol_res": np.inf,
        "nl_divergence_tol": np.inf,
    }
    t0 = time.perf_counter()
    fn = m._build_fused_time_block(cs, solver, nl, subst, chunk)
    envs = cs._envs(eq)
    x0 = device_policy.put(eq._global_vector())
    na = jnp.asarray(chunk, jnp.int32)
    out = fn(x0, envs, solver._m_state, na)
    jax.block_until_ready(out)
    print(f"compile+warm_s {time.perf_counter()-t0:.2f}", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x0, envs, solver._m_state, na))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    print(
        f"backend={jax.default_backend()} block_ms={wall*1000:.1f} "
        f"per_step_ms={wall*1000/chunk:.1f} (chunk={chunk}) "
        f"num_dofs={eq.num_dofs()}",
        flush=True,
    )


if __name__ == "__main__":
    cs = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0 / 128
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(cs, ch)
