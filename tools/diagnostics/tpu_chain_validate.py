"""Sacrificial validation: chained TPU blocks, ONE end pull, compare vs CPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import faulthandler; faulthandler.dump_traceback_later(1700, exit=True)
import numpy as np, jax, jax.numpy as jnp
from porepy_tpu.applications.benchmarking import build_case
from porepy_tpu.utils import device_policy

m, params = build_case("md")
m.prepare_simulation(); m.before_nonlinear_loop()
eq = m.equation_system; cs = eq.compiled_system()
for ce in cs.ces:
    if ce.env_spec.last_refreshed is None: ce.env_spec.last_refreshed = ()
subst = m._fused_block_substitution(cs)
solver = m._device_solver_for(cs)
m._refresh_preconditioner_host(cs, solver)
nl = {"max_iterations": 10, "nl_convergence_tol": 1e-10,
      "nl_convergence_tol_res": np.inf, "nl_divergence_tol": np.inf}
fn = m._build_fused_time_block(cs, solver, nl, subst, 8)
envs = cs._envs(eq); na = jnp.asarray(8, jnp.int32)
x0 = eq._global_vector()

cpu = jax.local_devices(backend="cpu")[0]
tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
exp = jax.export.deserialize(open("/root/repo/.jax_cache/exports/md_tpu.jaxexp","rb").read())

# TPU: 3 chained blocks (24 time steps) via the exported artifact
flat, _ = jax.tree.flatten((device_policy.put(np.asarray(x0), tpu), envs, solver._m_state, na))
x = flat[0]
for _ in range(3):
    o = exp.call(x, *flat[1:])
    x = o[0][7]
jax.block_until_ready(x)
print("tpu chain done", flush=True)

# CPU: same 3 chained blocks via the CPU jit path
envs_c = jax.device_put(envs, cpu)
ms_c = jax.device_put(solver._m_state, cpu)
xc = jax.device_put(jnp.asarray(x0), cpu)
na_c = jax.device_put(na, cpu)
for _ in range(3):
    oc = fn(xc, envs_c, ms_c, na_c)
    xc = oc[0][7]
xc_np = np.asarray(xc)
print("cpu chain done", flush=True)

t0 = time.perf_counter()
x_np = np.asarray(x)   # THE pull
print(f"pull took {time.perf_counter()-t0:.1f}s", flush=True)
rel = np.abs(x_np - xc_np).max() / max(np.abs(xc_np).max(), 1e-30)
print("finite:", bool(np.isfinite(x_np).all()), "max rel diff tpu-vs-cpu:", float(rel), flush=True)
assert np.isfinite(x_np).all() and rel < 1e-6, "TPU chained result mismatch"
print("VALIDATED", flush=True)
