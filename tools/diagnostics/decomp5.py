"""In the degraded model process: count live device memory, then free the
model and see whether per-op speed returns."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import gc
import time
import numpy as np
import jax, jax.numpy as jnp

import porepy_tpu as pt
from bench import FRACTURES_2D, _timed


def live(tag):
    arrs = jax.live_arrays()
    print(f"[{tag}] live_arrays: {len(arrs)}, {sum(a.nbytes for a in arrs)/1e6:.1f} MB", flush=True)


def synth_mv_rate(tag):
    n, K = 18157, 9
    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.standard_normal((n, K)))
    col = jnp.asarray(rng.integers(0, n, size=(n, K)).astype(np.int64))
    r = jnp.asarray(rng.standard_normal(n))

    @jax.jit
    def mv(val, col, r):
        def body(_i, r):
            r_p = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
            y = jnp.sum(val * r_p[col], axis=1)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-30)
        return jax.lax.fori_loop(0, 200, body, r)

    out = mv(val, col, r); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = mv(val, col, r); jax.block_until_ready(out)
    print(f"[{tag}] synth matvec: {(time.perf_counter()-t0)/200*1e3:.4f} ms/mv", flush=True)

    @jax.jit
    def triv(r):
        return r * 1.0000001
    out = triv(r); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = triv(r); jax.block_until_ready(out)
    print(f"[{tag}] trivial dispatch: {(time.perf_counter()-t0)/5*1e3:.3f} ms", flush=True)


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
synth_mv_rate("fresh")
print("preparing...", flush=True)
t0 = time.perf_counter()
m = Model(params)
m.prepare_simulation()
print(f"prepared in {time.perf_counter()-t0:.1f}s", flush=True)
live("after prepare")
synth_mv_rate("after prepare")

# Free EVERYTHING model-related.
import porepy_tpu.numerics.ad.compiler as comp
m.equation_system._compiled_systems.clear() if hasattr(m.equation_system, "_compiled_systems") else None
del m
comp._DEVICE_CONSTS.clear()
gc.collect()
live("after free")
synth_mv_rate("after free")
