"""Isolate dispatch overhead vs in-loop cost in the live-model process."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time
import numpy as np
import jax, jax.numpy as jnp

import porepy_tpu as pt
from bench import FRACTURES_2D, _timed


class Model(_timed(pt.SinglePhaseFlow)):
    def set_fractures(self):
        self._fractures = [pt.LineFracture(f) for f in FRACTURES_2D]

    def bc_values_pressure(self, bg):
        return 1.0 - bg.cell_centers[1]


params = {
    "grid_type": "cartesian",
    "meshing_arguments": {"cell_size": 1.0 / 128},
    "material_constants": {
        "solid": pt.SolidConstants(permeability=1.0, porosity=0.1,
                                   residual_aperture=0.01, normal_permeability=1.0),
        "fluid": pt.FluidComponent(compressibility=1e-6, viscosity=1e-3, density=1000.0),
    },
    "time_manager": pt.TimeManager([0, 6.0], 1.0, constant_dt=True),
    "linear_solver": "device_gmres",
}
print("preparing...", flush=True)
m = Model(params)
m.prepare_simulation()
print("prepared", flush=True)
m.before_nonlinear_loop()
m.before_nonlinear_iteration()
eq_sys = m.equation_system
cs = eq_sys.compiled_system()
envs = cs._envs(eq_sys)
x0 = jnp.asarray(eq_sys._global_vector())
solver = m._device_solver_for(cs)
data0, b0 = cs._data_and_rhs(x0, envs)
jax.block_until_ready(data0)
solver.refresh_preconditioner(data0)
m_state = solver._m_state
n_env_arrays = len(jax.tree.leaves(envs))
n_mstate_arrays = len(jax.tree.leaves(m_state))
print(f"envs leaves: {n_env_arrays}, m_state leaves: {n_mstate_arrays}", flush=True)


def timeit(fn, *args, reps=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


r0 = jnp.asarray(np.random.default_rng(0).standard_normal(solver.n))

# 1. dispatch-only: trivial op with m_state as arg vs without.
@jax.jit
def trivial_nostate(r):
    return r * 1.0000001

@jax.jit
def trivial_state(m_state, r):
    return r * 1.0000001 + 1e-30 * m_state["mdr"][0]

@jax.jit
def trivial_envs(envs, r):
    leaf = jax.tree.leaves(envs)[0]
    return r * 1.0000001 + 1e-30 * jnp.asarray(leaf).ravel()[0]

print(f"dispatch trivial (1 arg): {timeit(trivial_nostate, r0)*1e3:.3f} ms", flush=True)
print(f"dispatch trivial (+m_state {n_mstate_arrays} leaves): {timeit(trivial_state, m_state, r0)*1e3:.3f} ms", flush=True)
print(f"dispatch trivial (+envs {n_env_arrays} leaves): {timeit(trivial_envs, envs, r0)*1e3:.3f} ms", flush=True)

# 2. real system matvec at N=20 vs N=200 in-loop iterations.
for N_IN in (20, 200):
    @jax.jit
    def mv_loop(data, r, ell_sel, ell_col):
        data_p = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
        val = data_p[ell_sel]
        def body(_i, r):
            r_p = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
            y = jnp.sum(val * r_p[ell_col], axis=1)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
        return jax.lax.fori_loop(0, N_IN, body, r)
    t = timeit(mv_loop, data0, r0, solver._ell_sel, solver._ell_col)
    print(f"system matvec loop N={N_IN}: {t*1e3:.2f} ms total -> {t/N_IN*1e3:.3f} ms/mv", flush=True)

# 3. synthetic same-shape matvec in this same process.
n, K = solver._ell_sel.shape
rng = np.random.default_rng(0)
val_s = jnp.asarray(rng.standard_normal((n, K)))
col_s = jnp.asarray(rng.integers(0, n, size=(n, K)).astype(np.int64))
@jax.jit
def mv_synth(val, col, r):
    def body(_i, r):
        r_p = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
        y = jnp.sum(val * r_p[col], axis=1)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
    return jax.lax.fori_loop(0, 200, body, r)
t = timeit(mv_synth, val_s, col_s, r0)
print(f"synthetic matvec loop N=200: {t*1e3:.2f} ms total -> {t/200*1e3:.4f} ms/mv", flush=True)

# 4. M apply at N=20 vs N=100.
for N_IN in (20, 100):
    @jax.jit
    def m_loop(m_state, r):
        def body(_i, r):
            y = solver._m_apply(m_state, r)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
        return jax.lax.fori_loop(0, N_IN, body, r)
    t = timeit(m_loop, m_state, r0)
    print(f"M apply loop N={N_IN}: {t*1e3:.2f} ms total -> {t/N_IN*1e3:.3f} ms/apply", flush=True)

# 5. assembly at N=20 vs N=60.
for N_IN in (20, 60):
    @jax.jit
    def asm_loop(x, envs):
        def body(_i, x):
            _data, b = cs._data_and_rhs(x, envs)
            return x + 1e-30 * b
        return jax.lax.fori_loop(0, N_IN, body, x)
    t = timeit(asm_loop, x0, envs, reps=3)
    print(f"assembly loop N={N_IN}: {t*1e3:.2f} ms total -> {t/N_IN*1e3:.3f} ms/asm", flush=True)
